"""Sweep DIA SpMV kernel variants at benchmark scale on the real chip.

Round-3 follow-up to benchmarks/dia_micro.py: the micro probe showed the
dbuf kernel's 2x-off-roofline gap is the sliding-window x re-read
((tile+span)/tile = 3.5x overlap at 200^3); the chunk-resident "win"
kernel amortizes one (chunk+span)-row DMA over 16 tiles (~1.15x).
This sweeps the REAL dia_spmv_pallas end-to-end (analytic 200^3 build,
fused-chain differential timing from bench.py) across variants.

Usage: python benchmarks/dia_variant_sweep.py [n] [variants,csv]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import build_stencil_dia, log, phys_gbps, spmv_chain_time  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    variants = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["auto", "dbuf", "win", "win_carry", "win_gcarry"]
    )
    A, b, xexact, _setup = build_stencil_dia(n)
    eff_bytes = 8.0 * A.nnz  # reference byte model (4 B val + 4 B idx)
    y_ref = None
    for v in variants:
        Av = A.replace(variant=v)
        try:
            y = np.asarray(Av.spmv(b), np.float64)
        except Exception as e:  # noqa: BLE001
            log(f"{v:12s} FAILED: {e!r}")
            continue
        if y_ref is None:
            y_ref = y
        err = float(
            np.max(np.abs(y - y_ref)) / max(1e-30, np.max(np.abs(y_ref)))
        )
        dt = spmv_chain_time(Av)
        log(
            f"{v:12s} {dt * 1e3:8.3f} ms  {eff_bytes / dt / 1e9:7.1f} GB/s eff"
            f"  {phys_gbps(Av, dt):7.1f} GB/s phys  maxdiff={err:.2e}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
