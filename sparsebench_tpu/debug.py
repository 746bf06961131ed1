"""Debug dump helpers (reference comm.c:717-861 + VERBOSE per-rank logs).

The reference, under -DVERBOSE, writes per-rank ``out-<rank>.txt`` files
(comm.c:873-877) and offers dump routines for the intermediate matrix, the
converted matrix, and vectors (commGMatrixDump comm.c:821,
commMatrixDump comm.c:717, commVectorDump comm.c:806) — its only tool for
debugging distributed runs. Same facility here, per shard, driven by the
``SB_VERBOSE`` environment variable or explicit calls.
"""

from __future__ import annotations

import os
from typing import Optional, TextIO

import numpy as np


def verbose_enabled() -> bool:
    return bool(os.environ.get("SB_VERBOSE"))


def shard_log(shard: int, directory: str = ".") -> TextIO:
    """Per-shard log file (reference out-<rank>.txt, comm.c:873-877)."""
    return open(os.path.join(directory, f"out-{shard}.txt"), "a")


def dump_csr(csr, f: TextIO, label: str = "GMatrix") -> None:
    """Reference commGMatrixDump (comm.c:821-861): sizes, rowPtr, entries."""
    f.write(
        f"{label}: nr={csr.nr} nc={csr.nc} nnz={csr.nnz} "
        f"startRow={csr.start_row} stopRow={csr.stop_row} "
        f"totalNr={csr.total_nr}\n"
    )
    f.write("rowPtr: " + " ".join(str(v) for v in csr.row_ptr) + "\n")
    for i in range(csr.nr):
        lo, hi = csr.row_ptr[i], csr.row_ptr[i + 1]
        ents = " ".join(
            f"({csr.col[j]},{csr.val[j]:g})" for j in range(lo, hi)
        )
        f.write(f"row {i}: {ents}\n")


def dump_vector(v, f: TextIO, label: str = "vec") -> None:
    """Reference commVectorDump (comm.c:806-819)."""
    arr = np.asarray(v)
    f.write(f"{label}[{arr.shape[0]}]: ")
    f.write(", ".join(f"{x:f}" for x in arr))
    f.write("\n")


def dump_device_matrix(A, f: TextIO) -> None:
    """Reference commMatrixDump (comm.c:717-804): format-specific layout."""
    f.write(f"DeviceMatrix {type(A).__name__}: nr={A.nr} nc={A.nc}\n")
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(A):
        name = jax.tree_util.keystr(path)
        arr = np.asarray(leaf)
        f.write(f"  {name}: shape={arr.shape} dtype={arr.dtype}\n")
        if arr.size <= 512:
            f.write("    " + ", ".join(f"{x:g}" for x in arr.reshape(-1)) + "\n")


def maybe_dump_partition(part, directory: str = ".") -> None:
    """Write per-shard partition dumps when SB_VERBOSE is set."""
    if not verbose_enabled():
        return
    for s, csr in enumerate(part.shards):
        with shard_log(s, directory) as f:
            dump_csr(csr, f, label=f"shard{s}")
            plan = part.plan
            f.write(
                f"halo: n_ext={plan.n_ext[s]} offsets={list(plan.offsets)} "
                f"comm_words={plan.comm_words_per_shard[s]}\n"
            )
