"""Headline benchmark: SpMV throughput on the HPCG-class generated problem.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Metric: best effective SpMV bandwidth over the framework's device formats
on the 27-pt stencil problem, using the reference's byte model
((value+index) bytes per nonzero, src/profiler.c:20,41 + src/main.c:187-189)
— i.e. the bytes the *reference implementation* would have to move, divided
by our per-iteration time. vs_baseline is relative to the BASELINE.json
north-star target: 70% of the v5e HBM STREAM roofline (0.7 * 819 GB/s).

Timing is a fused lax.fori_loop chain (one dispatch for all repetitions) —
the single-chip analog of the reference's `-t spmv` path (src/main.c:200-216)
without its per-call overhead.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

HBM_ROOFLINE_GBPS = 819.0  # v5e
TARGET_FRACTION = 0.70


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def chain_time(step, A, carry, reps=30, trials=5):
    """Time step(A, u) repeated ``reps`` times inside one jitted fori_loop.

    A is a jit *argument*: closing over device arrays would embed them as
    constants in the HLO (a 100^3 matrix is hundreds of MB of program).
    """
    import jax

    import jax.numpy as jnp

    @jax.jit
    def chain(A, c):
        out = jax.lax.fori_loop(0, reps, lambda _, u: step(A, u), c)
        # scalar summary forces the device to finish ALL iterations before
        # the host readback completes — block_until_ready alone has been
        # observed returning early through the axon relay
        return out, jnp.sum(out)

    _, sval = chain(A, carry)
    float(sval)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _, sval = chain(A, carry)
        float(sval)  # host sync on a value dependent on every iteration
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats import from_csr
    from sparsebench_tpu.host import generate_stencil

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    fmts = sys.argv[2].split(",") if len(sys.argv) > 2 else ["dia", "bsell"]
    policy = DTypePolicy.from_names("f32", "i32")
    log(f"devices: {jax.devices()}")

    t0 = time.perf_counter()
    csr = generate_stencil(n, n, n, dtype=np.float32)
    log(f"generated {n}^3 27-pt problem: {csr.nnz} nnz in "
        f"{time.perf_counter() - t0:.1f}s")
    model_bytes = csr.nnz * (policy.value_bytes + policy.index_bytes)

    results = {}
    for fmt in fmts:
        try:
            t0 = time.perf_counter()
            A = from_csr(fmt, csr, policy)
            jax.block_until_ready(jax.tree_util.tree_leaves(A))
            build_s = time.perf_counter() - t0
            def step(A, u, nc=A.nc):
                y = A.spmv(u)
                if y.shape[0] == nc:
                    return y
                return jnp.concatenate([y, u[y.shape[0] :]])

            dt = chain_time(step, A, jnp.ones(A.nc, jnp.float32))
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
    out = {
        "metric": f"spmv_effective_bandwidth_{n}cubed_{best_fmt}",
        "value": round(value, 2),
        "unit": "GB/s",
        "vs_baseline": round(value / target, 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
