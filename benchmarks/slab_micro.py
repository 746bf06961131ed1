"""Microbenchmark: per-slice x-table assembly strategies for the BSELL
general-format SpMV kernel (VERDICT r2 #1 — quantify the table-assembly
cost and the ceiling of each alternative).

The BSELL kernel's unit of work is a "slice": an (8, 128) tile of values
whose x sources lie in one known 128-column block per sublane. The r2
kernel assembles the (8,128) lookup table from 8 scattered single-row VMEM
loads + a concat — NOTES.md identifies this as the bottleneck (~8 VPU ops
serving 2 compute ops). Variants measured here:

  scatter8  8 per-sublane row loads + concat + lane-gather + fma
            (the round-2 kernel's structure)
  slab_u    ONE unaligned 8-row dynamic slice as the table (+ gather + fma)
            — requires the slab layout: per-slice constant block-diagonal
            d so sublane s's block is dbase + s
  slab_a    same with 8-row-aligned dbase (alignment cost probe)
  aff_u     slab_u with the lane index COMPUTED ((lane + r) & 127, r a
            per-slice scalar) instead of streamed from an int8 plane —
            drops 1/3 of the slice's byte traffic (affine slices: every
            DIA-like diagonal part is affine)
  fixed     table is a static x slice (no per-slice addressing at all) —
            isolates gather + fma + value streaming
  noload    table precomputed once outside the slice loop — pure
            gather + fma ceiling

Each variant runs the same fused data-dependent chain harness as bench.py
(differential timing, traced rep count). Sizes mimic the 200^3 workload's
per-tile slice count with whole-x VMEM residency (1M rows).

Usage: python benchmarks/slab_micro.py [s_max] [n_tiles]
       (on CPU runs interpret-mode correctness checks only)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _specs(s_max, smem_rows):
    """Common BlockSpecs: per-tile SMEM metadata + VMEM value planes."""
    meta = pl.BlockSpec((1, s_max, smem_rows) if smem_rows else (1, s_max),
                        (lambda t: (t, 0, 0)) if smem_rows else
                        (lambda t: (t, 0)),
                        memory_space=pltpu.SMEM)
    vals = pl.BlockSpec((1, s_max, SUBLANES, LANES), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return meta, vals


def make_kernel(variant: str, s_max: int, with_lidx: bool):
    iota = None

    def body(meta_ref, x_ref, vals_ref, lidx_ref, y_ref):
        iota2d = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
        acc = jnp.zeros((SUBLANES, LANES), y_ref.dtype)
        if variant == "noload":
            tbl0 = x_ref[0:SUBLANES, :]
        for p in range(s_max):
            if variant == "scatter8":
                rows = [
                    x_ref[pl.ds(meta_ref[0, p, s], 1), :]
                    for s in range(SUBLANES)
                ]
                tbl = jnp.concatenate(rows, axis=0).reshape(SUBLANES, LANES)
            elif variant in ("slab_u", "slab_a", "aff_u", "aff_roll",
                             "floor"):
                tbl = x_ref[pl.ds(meta_ref[0, p, 0], SUBLANES), :]
            elif variant == "fixed":
                tbl = x_ref[0:SUBLANES, :]
            elif variant == "noload":
                tbl = tbl0
            else:
                raise ValueError(variant)
            if variant == "aff_roll":
                # (lane + r) & 127 as a single dynamic lane ROTATION:
                # roll(x, s)[i] = x[(i - s) % n] -> shift = -r
                g = pltpu.roll(tbl, -meta_ref[0, p, 1], axis=1)
            elif variant == "floor":
                g = tbl  # no lane permutation at all: fma-only floor
            elif with_lidx:
                idx = lidx_ref[0, p].astype(jnp.int32)
                g = jnp.take_along_axis(tbl, idx, axis=1)
            else:  # affine via general gather: idx = (lane + r) & 127
                idx = (iota2d + meta_ref[0, p, 1]) & (LANES - 1)
                g = jnp.take_along_axis(tbl, idx, axis=1)
            acc = acc + vals_ref[0, p].astype(acc.dtype) * g
        y_ref[0] = acc

    del iota
    return body


@functools.partial(
    jax.jit, static_argnames=("variant", "s_max", "with_lidx", "interpret")
)
def run_variant(meta, x2d, vals, lidx, *, variant, s_max, with_lidx,
                interpret=False):
    n_tiles = vals.shape[0]
    meta_spec, vals_spec = _specs(s_max, meta.shape[2] if meta.ndim == 3 else 0)
    lidx_spec = pl.BlockSpec((1, s_max, SUBLANES, LANES),
                             lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(variant, s_max, with_lidx),
        grid=(n_tiles,),
        in_specs=[meta_spec, pl.BlockSpec(memory_space=pltpu.VMEM),
                  vals_spec, lidx_spec],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), x2d.dtype),
        interpret=interpret,
    )(meta, x2d, vals, lidx)


def build_inputs(s_max: int, n_tiles: int, rng, val_dtype=jnp.bfloat16):
    """Synthetic banded-ish problem: slice p of tile t reads the slab at
    dbase = 8t + (p % 17) - 8 (clipped), rotation r = p % 128. The
    scatter8 metadata encodes the same slabs row-by-row so all variants
    compute comparable work (scatter8/slab/fixed differ only in table
    addressing)."""
    n_xrows = n_tiles * SUBLANES + 32
    x2d = jnp.asarray(
        rng.standard_normal((n_xrows, LANES)).astype(np.float32)
    )
    vals = jnp.asarray(
        rng.standard_normal((n_tiles, s_max, SUBLANES, LANES))
        .astype(val_dtype)
    )
    lidx = jnp.asarray(
        rng.integers(0, LANES, (n_tiles, s_max, SUBLANES, LANES))
        .astype(np.int8)
    )
    t_idx = np.arange(n_tiles)[:, None]
    p_idx = np.arange(s_max)[None, :]
    dbase = np.clip(SUBLANES * t_idx + (p_idx % 17) - 8, 0,
                    n_xrows - SUBLANES).astype(np.int32)
    r = (p_idx % LANES).astype(np.int32) + np.zeros_like(dbase)
    meta_slab = jnp.asarray(np.stack([dbase, r], axis=2))  # (T, S, 2)
    dbase_a = (dbase // 8 * 8).astype(np.int32)
    meta_slab_a = jnp.asarray(np.stack([dbase_a, r], axis=2))
    rows8 = dbase[:, :, None] + np.arange(SUBLANES)[None, None, :]
    meta_scatter = jnp.asarray(rows8.astype(np.int32))     # (T, S, 8)
    return x2d, vals, lidx, meta_slab, meta_slab_a, meta_scatter


def reference_result(variant, meta, x2d, vals, lidx, with_lidx):
    """numpy oracle for correctness checks."""
    x = np.asarray(x2d)
    v = np.asarray(vals).astype(np.float32)
    li = np.asarray(lidx).astype(np.int64)
    T, S = v.shape[:2]
    y = np.zeros((T, SUBLANES, LANES), np.float32)
    lanes = np.arange(LANES)
    for t in range(T):
        for p in range(S):
            if variant == "scatter8":
                tbl = x[np.asarray(meta)[t, p]]
            elif variant in ("slab_u", "slab_a", "aff_u", "aff_roll",
                             "floor"):
                b = int(np.asarray(meta)[t, p, 0])
                tbl = x[b : b + SUBLANES]
            else:
                tbl = x[0:SUBLANES]
            if variant == "floor":
                g = tbl
            elif with_lidx and variant not in ("aff_roll",):
                g = np.take_along_axis(tbl, li[t, p], axis=1)
            else:
                rr = int(np.asarray(meta)[t, p, 1])
                idx = np.broadcast_to((lanes + rr) & (LANES - 1),
                                      (SUBLANES, LANES))
                g = np.take_along_axis(tbl, idx, axis=1)
            y[t] += v[t, p] * g
    return y


def chain_time(fn_args, reps=20, trials=3):
    """Differential fused-chain timing (see bench.py spmv_chain_time)."""
    meta, x2d, vals, lidx, kw = fn_args

    @functools.partial(jax.jit, static_argnames=())
    def chain(meta, x2d, vals, lidx, n):
        def step(c):
            y = run_variant(meta, c, vals, lidx, **kw)
            flat = y.reshape(-1)
            # y is shorter than x (x has padding rows): keep the tail of
            # the carry so shapes match and the chain stays data-dependent
            newflat = jnp.concatenate([flat, c.reshape(-1)[flat.shape[0]:]])
            return newflat.reshape(c.shape)

        out = jax.lax.fori_loop(0, n, lambda _, c: step(c), x2d)
        return out, jnp.sum(out[::257, ::17])

    for n in (reps, 3 * reps):
        _, s = chain(meta, x2d, vals, lidx, n)
        float(s)

    def timed(n):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _, s = chain(meta, x2d, vals, lidx, n)
            float(s)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(reps), timed(3 * reps)
    dt = (t_hi - t_lo) / (2 * reps)
    return dt if dt > 0 else t_hi / (3 * reps)


VARIANTS = [
    ("scatter8", True),
    ("slab_u", True),
    ("slab_a", True),
    ("aff_u", False),
    ("aff_roll", False),
    ("floor", False),
    ("fixed", True),
    ("noload", True),
]


def check_correctness():
    """Interpret-mode check of every variant against the numpy oracle."""
    rng = np.random.default_rng(0)
    s_max, n_tiles = 5, 3
    x2d, vals, lidx, m_slab, m_slab_a, m_sc = build_inputs(s_max, n_tiles, rng)
    metas = {"scatter8": m_sc, "slab_u": m_slab, "slab_a": m_slab_a,
             "aff_u": m_slab, "aff_roll": m_slab, "floor": m_slab,
             "fixed": m_slab, "noload": m_slab}
    for variant, with_lidx in VARIANTS:
        meta = metas[variant]
        y = np.asarray(run_variant(
            meta, x2d, vals, lidx, variant=variant, s_max=s_max,
            with_lidx=with_lidx, interpret=True,
        ))
        want = reference_result(variant, meta, x2d, vals, lidx, with_lidx)
        err = np.abs(y - want).max() / max(np.abs(want).max(), 1e-9)
        status = "ok" if err < 2e-2 else "FAIL"
        log(f"  {variant:9s} rel err {err:.2e} {status}")
        assert err < 2e-2, variant
    log("interpret-mode correctness: all variants ok")


def main():
    s_max = int(sys.argv[1]) if len(sys.argv) > 1 else 54
    n_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    if jax.default_backend() == "cpu":
        # interpret-mode pallas on a remote device dispatches hundreds of
        # tiny ops through the ~30 ms relay — run the oracle checks on CPU
        # only (compiled-kernel results are cross-checked on TPU below)
        check_correctness()
        log("CPU backend: skipping timing (interpret checks only)")
        return
    rng = np.random.default_rng(1)
    x2d, vals, lidx, m_slab, m_slab_a, m_sc = build_inputs(
        s_max, n_tiles, rng
    )
    metas = {"scatter8": m_sc, "slab_u": m_slab, "slab_a": m_slab_a,
             "aff_u": m_slab, "aff_roll": m_slab, "floor": m_slab,
             "fixed": m_slab, "noload": m_slab}
    n_slices = s_max * n_tiles
    log(f"s_max={s_max} n_tiles={n_tiles}: vals "
        f"{vals.size * 2 / 1e6:.0f} MB bf16, lidx {lidx.size / 1e6:.0f} MB")
    # compiled cross-check: scatter8 and slab_u encode the SAME gather
    # (rows8 = dbase + arange(8)) so their results must agree bitwise-ish
    try:
        y_sc = np.asarray(run_variant(m_sc, x2d, vals, lidx,
                                      variant="scatter8", s_max=s_max,
                                      with_lidx=True))
        y_sl = np.asarray(run_variant(m_slab, x2d, vals, lidx,
                                      variant="slab_u", s_max=s_max,
                                      with_lidx=True))
        err = np.abs(y_sc - y_sl).max()
        log(f"compiled cross-check scatter8 vs slab_u: max abs diff {err:.2e}")
        if not (np.isfinite(err) and err < 1e-3 * max(np.abs(y_sc).max(), 1)):
            log("CROSS-CHECK FAILED — timings below are suspect")
    except Exception as e:  # noqa: BLE001
        log(f"cross-check failed to run: {e!r}")

    results = {}
    for variant, with_lidx in VARIANTS:
        kw = dict(variant=variant, s_max=s_max, with_lidx=with_lidx)
        try:
            dt = chain_time((metas[variant], x2d, vals, lidx, kw))
        except Exception as e:  # noqa: BLE001
            log(f"{variant}: FAILED {e!r}")
            continue
        ns_slice = dt / n_slices * 1e9
        bytes_slice = (SUBLANES * LANES) * (2 + (1 if with_lidx else 0))
        gbps = bytes_slice * n_slices / dt / 1e9
        results[variant] = (dt, ns_slice, gbps)
        log(f"{variant:9s} {dt * 1e3:7.3f} ms  {ns_slice:6.2f} ns/slice  "
            f"{gbps:6.1f} GB/s streamed")

    # f32-value pass: doubles the streamed bytes per slice at the same
    # per-slice op count — shows where each variant turns memory-bound
    vals32 = vals.astype(jnp.float32)
    for variant, with_lidx in VARIANTS:
        if variant in ("slab_a", "fixed", "noload"):
            continue
        kw = dict(variant=variant, s_max=s_max, with_lidx=with_lidx)
        try:
            dt = chain_time((metas[variant], x2d, vals32, lidx, kw))
        except Exception as e:  # noqa: BLE001
            log(f"{variant}_f32: FAILED {e!r}")
            continue
        ns_slice = dt / n_slices * 1e9
        bytes_slice = (SUBLANES * LANES) * (4 + (1 if with_lidx else 0))
        gbps = bytes_slice * n_slices / dt / 1e9
        results[variant + "_f32"] = (dt, ns_slice, gbps)
        log(f"{variant + '_f32':13s} {dt * 1e3:7.3f} ms  "
            f"{ns_slice:6.2f} ns/slice  {gbps:6.1f} GB/s streamed")
    print(repr(results))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    import os

    os._exit(0)
