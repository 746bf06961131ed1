"""One-process chip measurement of the CG variant family + BiCGStab.

Batches the remaining solver timings into a single TPU claim (each
fresh process risks a multi-minute claim wedge, NOTES.md): sstep and
pipe at the hpcg.par 200^3 workload, BiCGStab and the whole variant
sweep at 100^3. DIA analytic device build (the CLI's auto choice at
generated sizes); differential-free timing via the solvers' own warm
run + scalar-readback sync.

Usage:  python benchmarks/variants_chip.py [n ...]   (default 100 200)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.dia import DiaMatrix
from sparsebench_tpu.solvers.bicgstab import solve_bicgstab
from sparsebench_tpu.solvers.cg import check_residual, init_vectors, solve_cg
from sparsebench_tpu.utils import enable_compile_cache


def run(n: int) -> None:
    pol = DTypePolicy.from_names("f32", "i32")
    A, counts = DiaMatrix.from_stencil(n, n, n, policy=pol)
    _x0, b, xexact = init_vectors(row_lengths=counts, dtype=np.float32)
    print(f"== {n}^3 dia impl={A.impl}", flush=True)
    for variant in ("standard", "cs", "pipe", "sstep"):
        res = solve_cg(A, b, itermax=150, eps=0.0, variant=variant,
                       verbose=False)
        err = check_residual(res.x, xexact)
        print(f"cg[{variant:8s}] {n}^3: {res.solve_seconds:.4f}s "
              f"({res.iterations} iters, max|x-1| {err:.2e})", flush=True)
    res = solve_bicgstab(A, b, itermax=150, eps=0.0, verbose=False)
    err = check_residual(res.x, xexact)
    print(f"bicgstab       {n}^3: {res.solve_seconds:.4f}s "
          f"({res.iterations} iters, max|x-1| {err:.2e})", flush=True)


def main() -> int:
    enable_compile_cache()
    sizes = [int(a) for a in sys.argv[1:]] or [100, 200]
    for n in sizes:
        run(n)
    # all output exists — watchdog against the pre-return native-spin
    # wedge (this script wedged exactly there without it, NOTES.md)
    from sparsebench_tpu.utils import arm_dev_relay_exit_watchdog

    arm_dev_relay_exit_watchdog(0)
    return 0


if __name__ == "__main__":
    from sparsebench_tpu.utils import run_with_hard_exit

    run_with_hard_exit(main)
