"""Chip microbench: RGL slab layouts across the gather/byte Pareto.

Measures the n=2M band=512 deg=16 benchmark matrix under
  * exact caps        (r3 layout, tail=False)
  * auto (time model) (the _choose_caps alpha x span sweep's pick)
  * forced (alpha, span) points for the model-validation table

Reports per-spmv ms, effective GB/s (8 B/nnz reference model,
/root/reference/src/main.c:187-189), physical GB/s, and the model's
predicted cost units — the calibration data for
formats/rgl_build._kernel_cost. Run on the chip: python
benchmarks/rgl_layout_chip.py [n].
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    from sparsebench_tpu.utils import (
        arm_dev_relay_deadline,
        arm_dev_relay_exit_watchdog,
        enable_compile_cache,
    )

    enable_compile_cache()
    arm_dev_relay_deadline(2400.0)
    import jax
    import jax.numpy as jnp

    from bench import phys_gbps, spmv_chain_stats
    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats.rgl_build import _kernel_cost, rgl_bslab

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    band, deg, seed = 512, 16.0, 1
    policy = DTypePolicy.from_names("f32", "i32")
    print(f"devices: {jax.devices()}", flush=True)

    variants = [
        ("exact-caps (r3)", dict(tail=False)),
        ("auto time-model", dict(tail=True, objective="time")),
        ("auto bytes-model", dict(tail=True, objective="bytes")),
    ]
    rows = []
    for name, kw in variants:
        t0 = time.perf_counter()
        A, nnz = rgl_bslab(n, band=band, deg=deg, seed=seed,
                           policy=policy, **kw)
        jax.block_until_ready(A.vals_gen)
        tb = time.perf_counter() - t0
        y = np.asarray(A.spmv(jnp.ones(n, jnp.float32)))
        ok = np.isfinite(y).all() and np.abs(y - 1.0).max() < 1e-2
        dt, spread = spmv_chain_stats(A, reps=20, trials=3)
        eff = nnz * 8 / dt / 1e9
        phys = phys_gbps(A, dt)
        ng = len(A.wide_groups) if A.wide_groups else (1 if A.s_wide else 0)
        cost = _kernel_cost(A.s_gen, A.s_wide, A.wide_k, ng, 2.0)
        print(
            f"{name}: build {tb:.1f}s s_gen={A.s_gen} s_wide={A.s_wide} "
            f"K={A.wide_k} groups={ng} pad={A.padding_ratio:.2f} "
            f"impl={A.impl} | {dt * 1e3:.3f} ms (spread {spread:.1%}) "
            f"eff {eff:.1f} GB/s phys {phys:.1f} GB/s "
            f"model {cost:.0f} units | A@1 {'ok' if ok else 'BAD'}",
            flush=True,
        )
        rows.append((name, dt, eff, phys))
        del A
    arm_dev_relay_exit_watchdog(0, grace_s=10.0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
