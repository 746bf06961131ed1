"""Headline benchmark: CG time-to-solution on the reference's default
workload (27-pt stencil, 100^3, 150 iterations — src/parameter.c:14-19).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Default mode ``cg``: fused-loop CG solve seconds on one TPU chip.
``vs_baseline`` is the speedup over the C reference binary executing the
identical workload on this host's CPU (measured in-situ: 6.41 s solve for
150 iterations, serial GCC -O3 build of /root/reference, setup excluded for
both sides). Residual histories of the two implementations match to print
precision (tests/test_reference_parity.py).

``spmv`` mode (python bench.py spmv [n] [fmts]): best effective SpMV
bandwidth using the reference's byte model ((value+index) bytes per
nonzero, src/main.c:187-189), vs the BASELINE.json north-star target of
0.7 * 819 GB/s.

All timing syncs via scalar readbacks that depend on the full computation
(block_until_ready can return early through this environment's TPU relay).
Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# C reference (serial, GCC -O3) on this host, default workload: solve
# seconds for 150 iterations (setup excluded). Measured 2026-08-16.
REFERENCE_CG_SECONDS_100 = 6.41
HBM_ROOFLINE_GBPS = 819.0  # v5e nominal
TARGET_FRACTION = 0.70


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_cg(n: int = 100) -> int:
    import jax

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats import from_csr
    from sparsebench_tpu.host import generate_stencil
    from sparsebench_tpu.solvers.cg import check_residual, init_vectors, solve_cg

    policy = DTypePolicy.from_names("f32", "i32")
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    csr = generate_stencil(n, n, n, dtype=np.float32)
    log(f"generated {n}^3: {csr.nnz} nnz in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    A = from_csr("dia", csr, policy)
    jax.block_until_ready(jax.tree_util.tree_leaves(A))
    log(f"dia build+transfer {time.perf_counter() - t0:.1f}s")

    x0, b, xexact = init_vectors(csr, dtype=np.float32)

    def attempt(A):
        best_t = float("inf")
        good = False
        for _ in range(3):
            res = solve_cg(A, b, itermax=150, eps=0.0, verbose=False)
            err = check_residual(res.x, xexact)
            ok = np.isfinite(res.residual_history).all() and err < 1e-3
            log(f"solve: {res.solve_seconds:.3f}s ({res.iterations} iters, "
                f"final residual {res.final_normr:.2e}, max|x-1| {err:.2e}, "
                f"{'ok' if ok else 'INVALID'})")
            if ok:
                best_t = min(best_t, res.solve_seconds)
                good = True
        return best_t, good

    best, good = attempt(A)
    if not good:
        # transient TPU-relay corruption guard: retry on the XLA path
        log("pallas results invalid; retrying with the XLA dia path")
        A = from_csr("dia", csr, policy, impl="xla")
        best, good = attempt(A)
    if not good:
        print(json.dumps({"metric": f"cg_stencil{n}cubed_150iter_solve_seconds",
                          "value": 0.0, "unit": "s", "vs_baseline": 0.0}))
        return 1

    out = {
        "metric": f"cg_stencil{n}cubed_150iter_solve_seconds",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_CG_SECONDS_100 / best, 2)
        if n == 100
        else 0.0,
    }
    print(json.dumps(out))
    return 0


def bench_spmv(n: int, fmts) -> int:
    import jax
    import jax.numpy as jnp

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats import from_csr
    from sparsebench_tpu.host import generate_stencil

    policy = DTypePolicy.from_names("f32", "i32")
    log(f"devices: {jax.devices()}")
    csr = generate_stencil(n, n, n, dtype=np.float32)
    log(f"generated {n}^3: {csr.nnz} nnz")
    model_bytes = csr.nnz * (policy.value_bytes + policy.index_bytes)

    def chain_time(A, reps=30, trials=4):
        # A is a jit argument: closures embed device arrays as HLO constants

        @jax.jit
        def chain(A, c):
            def step(A, u):
                y = A.spmv(u)
                if y.shape[0] == A.nc:
                    return y
                return jnp.concatenate([y, u[y.shape[0]:]])

            out = jax.lax.fori_loop(0, reps, lambda _, u: step(A, u), c)
            return out, jnp.sum(out)

        carry = jnp.ones(A.nc, jnp.float32)
        _, sval = chain(A, carry)
        float(sval)  # scalar readback = reliable device sync
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _, sval = chain(A, carry)
            float(sval)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    results = {}
    for fmt in fmts:
        try:
            t0 = time.perf_counter()
            A = from_csr(fmt, csr, policy)
            jax.block_until_ready(jax.tree_util.tree_leaves(A))
            build_s = time.perf_counter() - t0
            dt = chain_time(A)
            gbps = model_bytes / dt / 1e9
            results[fmt] = gbps
            log(f"{fmt}: build {build_s:.1f}s, {dt * 1e3:.3f} ms/spmv, "
                f"{gbps:.1f} GB/s effective")
        except Exception as e:  # noqa: BLE001 — report and continue
            log(f"{fmt}: failed: {e!r}")

    if not results:
        print(json.dumps({"metric": "spmv_effective_bandwidth", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0}))
        return 1
    best_fmt = max(results, key=results.get)
    value = results[best_fmt]
    target = HBM_ROOFLINE_GBPS * TARGET_FRACTION
    print(json.dumps({
        "metric": f"spmv_effective_bandwidth_{n}cubed_{best_fmt}",
        "value": round(value, 2),
        "unit": "GB/s",
        "vs_baseline": round(value / target, 4),
    }))
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "spmv":
        n = int(args[1]) if len(args) > 1 else 100
        fmts = args[2].split(",") if len(args) > 2 else ["dia", "bsell"]
        return bench_spmv(n, fmts)
    n = int(args[0]) if args else 100
    return bench_cg(n)


if __name__ == "__main__":
    sys.exit(main())
