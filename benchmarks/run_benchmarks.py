"""Isolated kernel microbenchmarks: ddot, waxpby, SpMV per format.

The reference planned exactly this and never built it —
benchmarks/runBenchmarks.c is a 5-line TODO stub ("single core bench ddot,
waxpby, spMVM", SURVEY §2 row 21). Usage:

    python benchmarks/run_benchmarks.py [--n 64] [--reps 30] [--dtype f32]

Timing uses fused lax.fori_loop chains with a data-dependent carry so XLA
cannot collapse iterations, and DIFFERENTIAL rep counts — a traced loop
bound run at reps and 3*reps, per-op time = (t_hi - t_lo) / (2*reps) — so
the fixed per-dispatch round trip of the dev TPU relay (~30 ms, NOTES.md)
cancels instead of polluting every per-op number.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))

import numpy as np


def chain_time(step, carry, reps, trials=3):
    import jax

    @jax.jit
    def chain(c, n):
        return jax.lax.fori_loop(0, n, lambda k, u: step(k, u), c)

    for n in (reps, 3 * reps):  # one executable serves both trip counts
        jax.block_until_ready(chain(carry, n))

    def timed(n):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(carry, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(reps), timed(3 * reps)
    dt = (t_hi - t_lo) / (2 * reps)
    return dt if dt > 0 else t_hi / (3 * reps)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="grid edge (n^3 rows)")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64", "bf16"])
    ap.add_argument("--formats", default="dia,bsell,ell,sell,crs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats import from_csr
    from sparsebench_tpu.host import generate_stencil

    policy = DTypePolicy.from_names(args.dtype, "i32")
    policy.ensure_x64()
    vdt = jnp.dtype(policy.value)
    vb = policy.value_bytes

    csr = generate_stencil(args.n, args.n, args.n, dtype=policy.value)
    nr, nnz = csr.nr, csr.nnz
    print(f"problem: {args.n}^3 = {nr} rows, {nnz} nnz, {args.dtype}")
    print(f"devices: {jax.devices()}")
    print(f"{'kernel':<14}{'ms/call':>10}{'GB/s':>9}{'GFLOP/s':>10}")

    # ddot: 2 reads per element, 2 flops (reference model profiler.c:21)
    v = jnp.ones(nr, vdt)

    def ddot_step(k, u):
        s = jnp.sum(u * u)
        return u * (1.0 + 0.0 * s) + 1e-12 * k  # keep carry data-dependent

    dt = chain_time(ddot_step, v, args.reps)
    print(f"{'ddot':<14}{dt * 1e3:>10.3f}{2 * nr * vb / dt / 1e9:>9.1f}"
          f"{2 * nr / dt / 1e9:>10.2f}")

    # waxpby: 3 words, 2 flops per element per call (profiler.c:19 counts 6
    # flops over 3 calls per CG iteration)
    y = jnp.full(nr, 0.5, vdt)

    def wax_step(k, u):
        return 1.0 * u + 0.5 * y + 1e-12 * k

    dt = chain_time(wax_step, v, args.reps)
    print(f"{'waxpby':<14}{dt * 1e3:>10.3f}{3 * nr * vb / dt / 1e9:>9.1f}"
          f"{2 * nr / dt / 1e9:>10.2f}")

    # SpMV per format: reference byte model (value+index)/nnz (main.c:187-189)
    for fmt in args.formats.split(","):
        try:
            A = from_csr(fmt, csr, policy)
        except Exception as e:  # dia may reject; report and move on
            print(f"{'spmv-' + fmt:<14}{'—':>10} ({e})")
            continue
        spmv = A.spmv

        def spmv_step(k, u, spmv=spmv, nc=A.nc):
            out = spmv(u)
            if out.shape[0] != nc:
                out = jnp.concatenate([out, u[out.shape[0]:]])
            return out

        dt = chain_time(spmv_step, jnp.ones(A.nc, vdt), args.reps)
        by = nnz * (vb + policy.index_bytes)
        print(f"{'spmv-' + fmt:<14}{dt * 1e3:>10.3f}{by / dt / 1e9:>9.1f}"
              f"{2 * nnz / dt / 1e9:>10.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
