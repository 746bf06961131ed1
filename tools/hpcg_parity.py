"""hpcg.par head-to-head vs the C reference — the per-round artifact.

BASELINE.md row 2's bar ("distributed residual histories match the C
reference to 1e-10 on the hpcg.par problem") existed only as a manual
round-1 README claim (VERDICT r3 missing #1). This script turns it into
evidence, once per round:

  1. builds the reference from /root/reference with the residual prints
     widened to %.15E (tools/refbuild.py hi_precision — the stock %E has
     a 5e-7 parse floor that would mask the 1e-10 level entirely);
  2. runs `sparseBench-CRS-GCC -f hpcg.par` (200^3 27-pt stencil, 150
     iterations, eps 0 — /root/reference/hpcg.par:7-12, residual prints
     src/CGSolver.c:102,119 every printFreq=15);
  3. runs our CG in f64 on the CPU backend (the v5e chip has no native
     f64) on the identical generated problem, matrix-free stencil
     operator (values are the same 27/-1 integers — exactly
     representable, so the two sides compute the same operator);
  4. records the mutual relative deltas at every printed iteration plus
     the exact-solution diff into PARITY_r<NN>.json next to BENCH.

Interpretation note baked into the artifact: both sides run f64 but sum
in different orders (C: sequential per rank; XLA: tree reduction), so
the deltas grow with iteration count through CG's inherent sensitivity;
the bar applies to what identical-trajectory agreement CAN show, and the
artifact records exactly what was achieved per iteration.

Usage: python tools/hpcg_parity.py [out.json] [nx ny nz itermax]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_reference(exe: Path, args) -> dict:
    t0 = time.perf_counter()
    r = subprocess.run(
        [str(exe), *args], cwd=exe.parent, capture_output=True, text=True,
        timeout=1800,
    )
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(f"reference run failed: {r.stderr[-400:]}")
    out = {"initial": None, "hist": {}, "diff": None, "solve_seconds": None,
           "wall_seconds": wall}
    for line in r.stdout.splitlines():
        m = re.match(r"Initial Residual = (\S+)", line)
        if m:
            out["initial"] = float(m.group(1))
        m = re.match(r"Iteration = (\d+) Residual = (\S+)", line)
        if m:
            out["hist"][int(m.group(1))] = float(m.group(2))
        m = re.match(r"Difference between computed and exact\s+= (\S+)",
                     line)
        if m:
            out["diff"] = float(m.group(1))
        m = re.match(r"Solution performed \d+ iterations and took (\S+)s",
                     line)
        if m:
            out["solve_seconds"] = float(m.group(1))
    if out["initial"] is None or not out["hist"]:
        raise RuntimeError(f"no residuals parsed from:\n{r.stdout[-800:]}")
    return out


def run_ours(nx: int, ny: int, nz: int, itermax: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats.stencil import StencilOperator
    from sparsebench_tpu.solvers.cg import init_vectors, solve_cg

    policy = DTypePolicy.from_names("f64", "i32")
    t0 = time.perf_counter()
    A, counts = StencilOperator.from_stencil(nx, ny, nz, policy=policy)
    _, b, xexact = init_vectors(row_lengths=np.asarray(counts),
                                dtype=np.float64)
    setup_s = time.perf_counter() - t0
    res = solve_cg(A, b, itermax=itermax, eps=0.0, verbose=False)
    diff = float(np.abs(np.asarray(res.x, np.float64) - xexact).max())
    return {
        "history": [float(v) for v in res.residual_history],
        "diff": diff,
        "solve_seconds": res.solve_seconds,
        "setup_seconds": setup_s,
        "iterations": int(res.iterations),
    }


def main() -> int:
    args = sys.argv[1:]
    out_path = args[0] if args else "PARITY.json"
    nx, ny, nz, itermax = (
        (int(args[1]), int(args[2]), int(args[3]), int(args[4]))
        if len(args) > 4 else (200, 200, 200, 150)
    )

    from tools.refbuild import build_reference

    build = Path(tempfile.mkdtemp(prefix="refhpcg"))
    log(f"building reference (hi-precision prints) in {build}")
    exe = build_reference(build, hi_precision=True)

    if (nx, ny, nz, itermax) == (200, 200, 200, 150):
        ref_args = ["-f", "./hpcg.par"]
        workload = "hpcg.par (200^3 27-pt, 150 iters, eps 0)"
    else:
        ref_args = ["-x", str(nx), "-y", str(ny), "-z", str(nz),
                    "-i", str(itermax), "-e", "0.0"]
        workload = f"{nx}x{ny}x{nz} 27-pt, {itermax} iters, eps 0"
    log(f"running reference: {workload}")
    ref = run_reference(exe, ref_args)
    log(f"reference: initial {ref['initial']:.6e}, "
        f"{len(ref['hist'])} printed residuals, diff {ref['diff']}, "
        f"solve {ref['solve_seconds']}s")

    log("running ours (f64, CPU backend, matrix-free stencil operator)")
    ours = run_ours(nx, ny, nz, itermax)
    log(f"ours: {ours['iterations']} iters, diff {ours['diff']:.3e}, "
        f"solve {ours['solve_seconds']:.1f}s")

    hist = ours["history"]
    rows = []
    max_rel = abs(hist[0] - ref["initial"]) / ref["initial"]
    rows.append({"iter": 0, "ref": ref["initial"], "ours": hist[0],
                 "rel_delta": max_rel})
    for k in sorted(ref["hist"]):
        if k < len(hist):
            rel = abs(hist[k] - ref["hist"][k]) / abs(ref["hist"][k])
            rows.append({"iter": k, "ref": ref["hist"][k], "ours": hist[k],
                         "rel_delta": rel})
            max_rel = max(max_rel, rel)
    payload = {
        "workload": workload,
        "reference": "/root/reference @ sparseBench-CRS-GCC, serial, "
                     "-O3, %.15E residual prints (tools/refbuild.py)",
        "ours": "sparsebench_tpu solve_cg, f64, CPU backend (XLA), "
                "matrix-free StencilOperator",
        "bar": "1e-10 relative on every printed residual",
        "pass_1e-10": bool(max_rel <= 1e-10),
        "max_rel_delta": max_rel,
        "rows": rows,
        "exact_solution_diff": {"ref": ref["diff"], "ours": ours["diff"]},
        "solve_seconds": {"ref_c_binary": ref["solve_seconds"],
                          "ours_f64_cpu": ours["solve_seconds"]},
        "note": "both sides are f64; remaining deltas are summation-order "
                "(sequential vs tree reduction) amplified by CG's "
                "trajectory sensitivity, bounded as recorded per "
                "iteration",
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    log(f"wrote {out_path}: max_rel_delta {max_rel:.3e} "
        f"(bar 1e-10: {'PASS' if payload['pass_1e-10'] else 'MISS'})")
    print(json.dumps({"max_rel_delta": max_rel,
                      "pass_1e-10": payload["pass_1e-10"]}))
    return 0


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.exit(main())
