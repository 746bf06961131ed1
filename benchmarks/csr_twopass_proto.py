"""Non-positional CSR row-block SpMV prototype — the gather-wall probe.

VERDICT r4 next #5: docs/DESIGN.md's ~37.5 ns x sum_d max_r cnt(r,d)
floor was proved only for POSITIONAL (row-encoded-by-lane) layouts; this
script tests the floor against the compact (non-positional) design space
on the same n=2M / band=512 / deg=16 RGL matrix (host/rgl.py spec,
reference irregular-ingest analog src/matrix.c:123-229).

The compact layout stores the ~17.4 entries/row in per-row-block flat
streams (~5% block-granular padding instead of the positional 6.3x
slot padding) and pays the wall on the other side of the trade:

  pass 1 (Pallas): per (64,128) element tile, gather x[colrel] from the
      block's contiguous VMEM window (R + 2*band wide). Mosaic's gather
      is single-vreg-per-dimension, so the arbitrary windowed gather
      lowers to K = (R + 2*band)/128 shifted lane-gathers fused by
      select — K gather units per element tile, vs the positional
      layout's 1 unit per (slot) tile. Predicted pass-1 gather cost:
      nnz/8192 x K units vs positional sum_d max_r cnt(r,d) x n/8192
      units (107 per 8192 rows) — at K = 16 the compact side loses
      before pass 2 even starts.
  pass 2: the products land element-compact, so row sums need a
      segment reduction: (a) XLA sorted segment_sum, (b) a
      cumsum-difference (fast but cancellation-lossy — reported, not
      proposed), (c) fused one-pass XLA csrseg (jnp.take gather +
      segment_sum) as the non-Pallas realization of the same layout.

Build is fully ON DEVICE (relay host->device runs ~0.3-3 MB/s —
host-built streams are disqualifying, NOTES.md): the ELL intermediate
comes from lax.top_k over the banded hash mask, and the block streams
from a scatter + running-sum flattening; no per-element host work.

Usage:  python benchmarks/csr_twopass_proto.py [out.json]
        SB_PROTO_SMALL=1 -> n=128k/band=256 smoke size (CPU-safe).
Emits one JSON line: per-variant ms + validation errors + the
positional RGL bslab baseline measured the same way.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsebench_tpu.host.rgl import threshold
from sparsebench_tpu.ops.bslab_pallas import LANES

SUB = 16          # element-tile sublanes: (16, 128) tiles — the block_cap
#                   granularity; (64,128) tiles padded blocks 1.38x
CAP = 56          # ELL slots (edges + diagonal): P(Poisson(16) > 55) ~ 1e-15
CHUNK = 16384     # ELL build rows per jit step


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ------------------------------------------------------------- device build

@functools.partial(jax.jit, static_argnames=("n", "band", "thresh", "seed"))
def _ell_chunk(c0, n: int, band: int, thresh: int, seed: int):
    """(CHUNK, CAP) ELL columns + per-row entry counts for rows c0..c0+CHUNK.

    Same mix32 edge spec as formats/rgl_build.py _bucket_masks, evaluated
    on the full (-band..band) window; compaction via top_k on a
    descending position key (distinct keys -> stable ascending columns)."""
    rows = c0 + jnp.arange(CHUNK, dtype=jnp.int32)
    offs = jnp.arange(-band, band + 1, dtype=jnp.int32)
    w = offs.shape[0]
    j = rows[:, None] + offs[None, :]
    row_ok = rows < n
    inb = (j >= 0) & (j < n) & (offs[None, :] != 0) & row_ok[:, None]
    lo = jnp.minimum(rows[:, None], j)
    hi = jnp.maximum(rows[:, None], j)
    h = (jnp.maximum(lo, 0).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         + jnp.maximum(hi, 0).astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    h = h + jnp.uint32(seed) * jnp.uint32(0xC2B2AE3D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 16)
    edge = inb & (h < jnp.uint32(thresh))
    mask = edge | ((offs[None, :] == 0) & row_ok[:, None])
    deg = mask.sum(axis=1).astype(jnp.int32)  # includes the diagonal
    key = jnp.where(mask, w - jnp.arange(w, dtype=jnp.int32)[None, :], 0)
    topv, _ = jax.lax.top_k(key, CAP)                 # descending
    valid = topv > 0
    col = jnp.where(valid, rows[:, None] + (w - topv) - band, 0)
    return col.astype(jnp.int32), deg


@functools.partial(jax.jit, static_argnames=("rows_per_block", "block_cap",
                                             "band", "n_rows"))
def _block_chunk(b0, ell_col, deg, row_ptr, blk_start, blk_nnz,
                 rows_per_block: int, block_cap: int, band: int,
                 n_rows: int):
    """Flatten a chunk of row blocks into compact (val, colrel, row) slabs.

    No searchsorted: scatter a 1 at every row's start position inside its
    block, then a running sum recovers the row of each element slot."""
    nbc = blk_start.shape[0]
    r_all = (b0 * rows_per_block
             + jnp.arange(nbc * rows_per_block, dtype=jnp.int32))
    starts = row_ptr[r_all] - jnp.repeat(blk_start, rows_per_block)
    delta = jnp.zeros((nbc, block_cap), jnp.int32)
    delta = delta.at[
        jnp.repeat(jnp.arange(nbc, dtype=jnp.int32), rows_per_block),
        starts,
    ].add(1)
    rows_rel = jnp.cumsum(delta, axis=1) - 1                  # (nbc, cap)
    r = (b0 + jnp.arange(nbc, dtype=jnp.int32))[:, None] * rows_per_block \
        + rows_rel
    e = jnp.arange(block_cap, dtype=jnp.int32)[None, :]
    valid = e < blk_nnz[:, None]
    k = e - (row_ptr[r] - blk_start[:, None])
    col = ell_col.reshape(-1)[r * CAP + jnp.clip(k, 0, CAP - 1)]
    val = jnp.where(col == r, deg[r].astype(jnp.float32), -1.0)
    val = jnp.where(valid, val, 0.0)
    ws = (b0 + jnp.arange(nbc, dtype=jnp.int32))[:, None] * rows_per_block \
        - band
    colrel = jnp.where(valid, col - ws, 0)
    rowseg = jnp.where(valid, r, jnp.max(r, axis=1, keepdims=True))
    return val, colrel.astype(jnp.int32), rowseg.astype(jnp.int32)


def build_streams(n: int, band: int, deg: float, seed: int,
                  rows_per_block: int):
    thresh = int(threshold(band, deg))
    cols, degs = [], []
    for c0 in range(0, n, CHUNK):
        c, d = _ell_chunk(jnp.asarray(c0, jnp.int32), n, band, thresh, seed)
        cols.append(c)
        degs.append(d)
    ell_col = jnp.concatenate(cols)[:n]
    deg_v = jnp.concatenate(degs)[:n]
    overflow = int(jnp.sum(deg_v > CAP))
    if overflow:
        raise RuntimeError(f"{overflow} rows exceed ELL cap {CAP}")
    nnz = int(jnp.sum(deg_v))
    # ceil blocks: phantom tail rows carry deg 0 (their shared start
    # position only perturbs the invalid e >= blk_nnz slab region)
    nb = -(-n // rows_per_block)
    deg_pad = jnp.concatenate(
        [deg_v, jnp.zeros(nb * rows_per_block - n, jnp.int32)])
    row_ptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(deg_pad).astype(jnp.int32)]
    )
    blk_start = row_ptr[:-1:rows_per_block][:nb]
    blk_end = row_ptr[rows_per_block::rows_per_block][:nb]
    blk_nnz = blk_end - blk_start
    tile = SUB * LANES
    block_cap = int((int(jnp.max(blk_nnz)) + tile - 1) // tile) * tile
    vals, crels, rsegs = [], [], []
    bc = max(1, (1 << 25) // block_cap)  # ~128 MB temporaries per chunk
    for b0 in range(0, nb, bc):
        b1 = min(b0 + bc, nb)
        v, c, rs = _block_chunk(
            jnp.asarray(b0, jnp.int32), ell_col, deg_v, row_ptr,
            blk_start[b0:b1], blk_nnz[b0:b1],
            rows_per_block, block_cap, band, n,
        )
        vals.append(v)
        crels.append(c)
        rsegs.append(rs)
    val = jnp.concatenate(vals).reshape(nb, block_cap // LANES, LANES)
    colrel = jnp.concatenate(crels).reshape(nb, block_cap // LANES, LANES)
    rowseg = jnp.concatenate(rsegs).reshape(-1)
    jax.block_until_ready(val)
    pad_ratio = nb * block_cap / nnz
    return dict(val=val, colrel=colrel, rowseg=rowseg, row_ptr=row_ptr,
                blk_start=blk_start, nnz=nnz, nb=nb, block_cap=block_cap,
                pad_ratio=pad_ratio, deg=deg_v)


# ------------------------------------------------------------ pass 1 kernel

def _p1_kernel(x_ref, val_ref, colrel_ref, out_ref, *, K: int, R: int):
    """x whole-array VMEM-resident (8 MB at n=2M — the bslab kernel's
    whole-x mode precedent); the block window is ONE dynamic VMEM slice
    (hoisted — ops/bslab_pallas.py measured per-slice dynamic slicing at
    ~4x) + K static subslices, then the K-select gather chain."""
    b = pl.program_id(0)
    xw2 = x_ref[pl.ds(b * R, K * LANES)].reshape(K, LANES)
    cr = colrel_ref[0]
    lane = jnp.bitwise_and(cr, LANES - 1)
    dblk = jnp.right_shift(cr, 7)
    g = jnp.zeros((SUB, LANES), out_ref.dtype)
    for k in range(K):
        tbl = jnp.broadcast_to(xw2[k], (SUB, LANES))
        g = jnp.where(dblk == k, jnp.take_along_axis(tbl, lane, axis=1), g)
    out_ref[0] = val_ref[0] * g


@functools.partial(jax.jit, static_argnames=("band", "rows_per_block",
                                             "interpret"))
def pass1_products(val, colrel, xpad, band: int, rows_per_block: int,
                   interpret: bool = False):
    """(nb, cap/128, 128) products; xpad carries `band` lead zeros."""
    nb, capl, _ = val.shape
    K = (rows_per_block + 2 * band) // LANES
    tiles = capl // SUB
    kernel = functools.partial(_p1_kernel, K=K, R=rows_per_block)
    return pl.pallas_call(
        kernel,
        grid=(nb, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole x resident
            pl.BlockSpec((1, SUB, LANES), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANES), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(val.shape, val.dtype),
        interpret=interpret,
    )(xpad, val, colrel)


# --------------------------------------------------------------- variants

def make_variants(S, n: int, band: int, rows_per_block: int,
                  interpret: bool = False):
    """x -> y endomorphisms for the chain timer. Each takes the stream
    pytree as a jit ARGUMENT (closures would embed 400+ MB as HLO
    constants — NOTES.md)."""
    row_ptr, blk_start = S["row_ptr"], S["blk_start"]
    nb, block_cap = S["nb"], S["block_cap"]
    r_idx = jnp.arange(n, dtype=jnp.int32)
    b_of_r = r_idx // rows_per_block
    start_pad = b_of_r * block_cap + (row_ptr[r_idx] - blk_start[b_of_r])
    end_pad = b_of_r * block_cap + (row_ptr[r_idx + 1] - blk_start[b_of_r])
    pad = lambda x: jnp.concatenate(  # noqa: E731
        [jnp.zeros(band, x.dtype), x,
         jnp.zeros(rows_per_block + band, x.dtype)])

    def twopass_segsum(st, x):
        p = pass1_products(st["val"], st["colrel"], pad(x), band,
                           rows_per_block, interpret)
        return jax.ops.segment_sum(
            p.reshape(-1), st["rowseg"], num_segments=n,
            indices_are_sorted=True,
        )

    def twopass_cumsum(st, x):
        p = pass1_products(st["val"], st["colrel"], pad(x), band,
                           rows_per_block, interpret)
        P = jnp.concatenate(
            [jnp.zeros(1, p.dtype), jnp.cumsum(p.reshape(-1))])
        return P[st["end_pad"]] - P[st["start_pad"]]

    def pass1_only(st, x):
        p = pass1_products(st["val"], st["colrel"], pad(x), band,
                           rows_per_block, interpret)
        # real data dependence at negligible magnitude: keeps the chain
        # honest without a reduction pass
        return x + jnp.float32(1e-30) * jnp.sum(p.reshape(-1)[::4097])

    def csrseg_onepass(st, x):
        xp = pad(x)
        ws = (jnp.arange(nb, dtype=jnp.int32)
              * rows_per_block)[:, None, None]
        xg = xp[st["colrel"] + ws]
        return jax.ops.segment_sum(
            (st["val"] * xg).reshape(-1), st["rowseg"], num_segments=n,
            indices_are_sorted=True,
        )

    S = dict(S, start_pad=start_pad, end_pad=end_pad)
    return S, dict(twopass_segsum=twopass_segsum,
                   twopass_cumsum=twopass_cumsum,
                   pass1_only=pass1_only,
                   csrseg_onepass=csrseg_onepass)


# ----------------------------------------------------------------- timing

def chain_time(fn, streams, n: int, reps: int = 10, trials: int = 3,
               min_diff_s: float = 0.030):
    """Differential chain timing (bench.py spmv_chain_stats methodology:
    traced rep count, (t(3r) - t(r)) / 2r cancels the relay round trip,
    reps auto-scale above jitter, scalar-readback sync)."""
    @jax.jit
    def chain(st, x, nrep):
        out = jax.lax.fori_loop(0, nrep, lambda _, u: fn(st, u), x)
        return out, jnp.sum(out[::4097])

    x = jnp.ones(n, jnp.float32)
    for nr in (reps, 3 * reps):
        _, s = chain(streams, x, nr)
        float(s)

    def t_of(nr):
        t0 = time.perf_counter()
        _, s = chain(streams, x, nr)
        float(s)
        return time.perf_counter() - t0

    dt = max((t_of(3 * reps) - t_of(reps)) / (2 * reps), 1e-9)
    while 2 * reps * dt < min_diff_s and reps < 4096:
        reps *= 2
        for nr in (reps, 3 * reps):
            _, s = chain(streams, x, nr)
            float(s)
        dt = max((t_of(3 * reps) - t_of(reps)) / (2 * reps), 1e-9)
    ts = [(t_of(3 * reps) - t_of(reps)) / (2 * reps) for _ in range(trials)]
    best = min(ts)
    return best, (max(ts) - best) / best


# ------------------------------------------------------------------- main

def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    small = bool(os.environ.get("SB_PROTO_SMALL"))
    n, band, deg, seed = ((8192, 128, 16.0, 1) if small
                          else (2_000_000, 512, 16.0, 1))
    rows_per_block = 512 if small else 1024
    interpret = jax.devices()[0].platform == "cpu"
    K = (rows_per_block + 2 * band) // LANES

    t0 = time.perf_counter()
    S = build_streams(n, band, deg, seed, rows_per_block)
    log(f"build: n={n} nnz={S['nnz']} blocks={S['nb']} "
        f"block_cap={S['block_cap']} pad={S['pad_ratio']:.3f} "
        f"K={K} ({time.perf_counter() - t0:.1f}s)")
    S, variants = make_variants(S, n, band, rows_per_block, interpret)

    # validation: A @ 1 == 1 exactly (Laplacian + I row sums), plus
    # cross-check on a deterministic non-constant x
    xr = 0.5 + (jnp.arange(n, dtype=jnp.float32) % 97) / 97.0
    res = {"n": n, "band": band, "deg": deg, "nnz": S["nnz"],
           "rows_per_block": rows_per_block, "K_window_slabs": K,
           "block_pad_ratio": round(float(S["pad_ratio"]), 4)}
    y_ref = None
    ones = jnp.ones(n, jnp.float32)
    for name, fn in variants.items():
        if name == "pass1_only":
            continue
        y1 = np.asarray(fn(S, ones))
        err1 = float(np.abs(y1 - 1.0).max())
        yr = np.asarray(fn(S, xr))
        if y_ref is None:
            y_ref = yr
            errx = 0.0
        else:
            errx = float(np.abs(yr - y_ref).max()
                         / np.abs(y_ref).max())
        res[f"{name}_err_ones"] = float(f"{err1:.3e}")
        res[f"{name}_err_cross"] = float(f"{errx:.3e}")
        log(f"validate {name}: |A@1 - 1| {err1:.2e}, cross {errx:.2e}")

    if small:  # independent oracle: the host-numpy spec CSR
        from sparsebench_tpu.host.rgl import rgl_csr

        y_h = rgl_csr(n, band=band, deg=deg, seed=seed).spmv(
            np.asarray(xr, np.float64))
        err_h = float(np.abs(y_ref - y_h).max() / np.abs(y_h).max())
        res["host_oracle_err"] = float(f"{err_h:.3e}")
        log(f"validate vs host-spec CSR oracle: {err_h:.2e}")
        assert err_h < 1e-5

    for name, fn in variants.items():
        dt, sp = chain_time(fn, S, n)
        res[f"{name}_ms"] = round(dt * 1e3, 4)
        res[f"{name}_spread"] = round(sp, 3)
        res[f"{name}_eff_GBps"] = round(8 * S["nnz"] / dt / 1e9, 1)
        log(f"{name}: {dt * 1e3:.3f} ms (spread {sp:.1%}, "
            f"{res[f'{name}_eff_GBps']} GB/s effective)")

    # positional baseline: the RGL bslab kernel, same spec, same timer
    if not small:
        try:
            from sparsebench_tpu.formats.rgl_build import rgl_bslab

            Ar, nnz_r = rgl_bslab(n, band=int(band), deg=deg, seed=seed)
            jax.block_until_ready(Ar.vals_aff)

            def bslab(st, x):
                return Ar.spmv(x)  # noqa: B023 — baseline closure is fine

            dt, sp = chain_time(bslab, {}, n)
            res["positional_bslab_ms"] = round(dt * 1e3, 4)
            res["positional_bslab_eff_GBps"] = round(
                8 * nnz_r / dt / 1e9, 1)
            log(f"positional bslab: {dt * 1e3:.3f} ms "
                f"({res['positional_bslab_eff_GBps']} GB/s effective)")
        except Exception as e:  # noqa: BLE001
            log(f"positional baseline failed: {e!r}")

    line = json.dumps(res)
    print(line, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
