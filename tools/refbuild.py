"""Build the C reference binary from /root/reference into a work dir.

Shared by tests/test_reference_parity.py (session fixture) and
tools/hpcg_parity.py (the per-round hpcg.par head-to-head artifact).
The copy is patched exactly like the round-1 parity fixture:

  * GCC toolchain, MPI off (no MPI in this image), -std=c2x;
  * a serial MPI-IO shim (tests/data/mpi_shim/mpi.h) so the REAL
    matrixBinfile.c code compiles and runs;
  * reference bug fix: serial commDistributeMatrix never sets
    totalNr/totalNnz (src/comm.c:405-411) — restored to the MPI path's
    semantics so `-c` writes a valid .bmx.

With ``hi_precision=True`` the residual prints are widened from %E
(6 significant digits — a 5e-7 parse floor that would mask everything
below it) to %.15E, and the exact-solution diff from %f to %.15e, so a
1e-10-level comparison against our f64 solver is actually measurable
(src/CGSolver.c:58,102,119).
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess

REFERENCE = pathlib.Path("/root/reference")
MPI_SHIM = (
    pathlib.Path(__file__).resolve().parent.parent
    / "tests" / "data" / "mpi_shim" / "mpi.h"
)


class RefBuildError(RuntimeError):
    pass


def build_reference(build: pathlib.Path, *, hi_precision: bool = False):
    """Copy + patch + make. Returns the path to the serial CRS binary.

    Raises RefBuildError when the source tree or toolchain is missing or
    the build fails (callers turn this into skip/abort as appropriate).
    """
    if not REFERENCE.exists():
        raise RefBuildError("/root/reference unavailable")
    if shutil.which("gcc") is None:
        raise RefBuildError("gcc unavailable")
    build = pathlib.Path(build)
    shutil.copytree(REFERENCE, build, dirs_exist_ok=True)
    cfg = build / "config.mk"
    cfg.write_text(
        cfg.read_text()
        .replace("TOOLCHAIN ?= ICC", "TOOLCHAIN ?= GCC")
        .replace("ENABLE_MPI ?= true", "ENABLE_MPI ?= false")
    )
    mk = build / "mk" / "include_GCC.mk"
    mk.write_text(mk.read_text().replace("-std=c23", "-std=c2x"))
    shutil.copy(MPI_SHIM, build / "src" / "mpi.h")
    comm_c = build / "src" / "comm.c"
    comm_c.write_text(
        comm_c.read_text().replace(
            "  mLocal->entries  = m->entries;",
            "  mLocal->entries  = m->entries;\n"
            "  mLocal->totalNr  = m->nr;\n"
            "  mLocal->totalNnz = m->nnz;",
        )
    )
    if hi_precision:
        cg_c = build / "src" / "CGSolver.c"
        src = cg_c.read_text()
        src = src.replace("Initial Residual = %E", "Initial Residual = %.15E")
        src = src.replace(
            "Iteration = %d Residual = %E", "Iteration = %d Residual = %.15E"
        )
        src = src.replace(
            "Difference between computed and exact  = %f",
            "Difference between computed and exact  = %.15e",
        )
        cg_c.write_text(src)
    r = subprocess.run(["make"], cwd=build, capture_output=True, text=True)
    exe = build / "sparseBench-CRS-GCC"
    if r.returncode != 0 or not exe.exists():
        raise RefBuildError(f"reference build failed: {r.stderr[-400:]}")
    return exe
