"""Real-chip measurement for the BSLAB format at hpcg.par scale (200^3).

Sweeps slice height (sub) and value storage (bf16-compressed vs f32) on
the analytic stencil build, validates each config against the analytic
row sums, and reports effective (reference byte model) + physical rates
against the in-situ STREAM triad. Also times CG.

Usage: python benchmarks/bslab_chip.py [n] [subs] [itermax]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import (  # noqa: E402
    log,
    measure_stream_triad,
    phys_gbps,
    spmv_chain_time,
    timed_cg,
)


def main():
    import jax

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats.bslab import BslabMatrix
    from sparsebench_tpu.solvers.cg import init_vectors

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    subs = [int(s) for s in (sys.argv[2].split(",") if len(sys.argv) > 2
                             else ["64", "32"])]
    itermax = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    policy = DTypePolicy.from_names("f32", "i32")
    log(f"devices: {jax.devices()}")
    stream = measure_stream_triad()
    log(f"STREAM triad: {stream:.1f} GB/s")

    results = {}
    best = None
    for sub in subs:
        for compress in (True, False):
            tag = f"sub{sub}_{'bf16' if compress else 'f32'}"
            try:
                t0 = time.perf_counter()
                A, counts = BslabMatrix.from_stencil(
                    n, n, n, policy=policy, sub=sub, compress=compress
                )
                jax.block_until_ready(A.vals_aff)
                setup_s = time.perf_counter() - t0
                log(f"{tag}: setup {setup_s:.1f}s impl={A.impl} "
                    f"s_aff={A.s_aff} tiles={A.n_tiles} W={A.w_blocks} "
                    f"pad={A.padding_ratio:.2f}")
                # validate: A @ 1 == row sums = 27 - (count-1) ... actually
                # row sum = 27 + (count-1)*(-1) = 28 - count
                import jax.numpy as jnp

                y = np.asarray(A.spmv(jnp.ones(A.nc, jnp.float32)))
                want = 28.0 - np.asarray(counts, np.float64)
                err = np.abs(y - want).max()
                if not (np.isfinite(err) and err < 1e-2 * 27):
                    log(f"{tag}: VALIDATION FAILED err={err}")
                    continue
                dt = spmv_chain_time(A, reps=20, trials=3)
                eff = A.nnz * 8 / dt / 1e9
                phys = phys_gbps(A, dt)
                results[tag] = (dt, eff, phys, setup_s)
                log(f"{tag}: {dt * 1e3:.3f} ms/spmv  {eff:.1f} GB/s eff  "
                    f"{phys:.1f} GB/s phys  ({phys / stream:.2f} of stream)")
                if best is None or dt < best[1]:
                    best = (tag, dt, A, counts)
            except Exception as e:  # noqa: BLE001
                log(f"{tag}: FAILED {e!r}")

    if best is not None:
        tag, dt, A, counts = best
        x0, b, xexact = init_vectors(row_lengths=counts, dtype=np.float32)
        t = timed_cg(A, b, xexact, n, itermax=itermax, attempts=2)
        log(f"CG {n}^3 x{itermax} via {tag}: {t}")
        results["cg_" + tag] = t
    print(repr({"stream": stream, **results}))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    import os

    os._exit(0)
