"""Device-side builder: RGL (random-graph Laplacian) -> BslabMatrix.

The host->device relay moves ~0.3-3 MB/s, so a >=10^7-nnz irregular
matrix cannot be uploaded (VERDICT r2 #2) — it is generated and laid out
entirely ON DEVICE from the (n, band, deg, seed) spec in host/rgl.py:

  * per tile of ``sub``*128 rows, the (rows x offsets) edge mask is pure
    u32 hash arithmetic on iota grids (no scatter, no gather);
  * the BSLAB slice layout uses STATIC per-block-diagonal capacity caps
    measured EXACTLY by a cheap phase-1 device pass (global max of the
    per-(row, d) entry count — a handful of scalars read back), so every
    slice plane in phase 2 has a static position;
  * a block-diagonal bucket d only involves offsets in the 255-wide
    window [128d-127, 128d+127] (the bucket of an entry is
    ((row mod 128) + off) >> 7), so all per-bucket work runs on (rows,
    <=255) windows instead of the full (rows, 2*band+1) grid — ~4x less
    traffic and a much smaller HLO graph than the full-width build;
  * the per-bucket plane extraction is ONE one-hot contraction
    (einsum over the window axis against one_hot(rank)) instead of
    cap-many masked reductions — rank k's entry has within-(row, d)
    cumulative count k+1, so the contraction reproduces the exact
    layout of the k-loop formulation, in a fraction of the graph;
  * a device-side overflow check cross-validates the two phases.

All slices are general (stored int8 lane indices) — the matrix is
irregular by design. Values are -1 / degree+1 <= 255, exactly
representable in bf16, so compression (and the bf16 one-hot
contraction) is lossless by construction.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.base import default_policy
from sparsebench_tpu.formats.bslab import BslabMatrix, _window_plan
from sparsebench_tpu.host.rgl import threshold
from sparsebench_tpu.ops.bslab_pallas import LANES


def _bucket_window(band: int, d: int) -> Tuple[int, int]:
    """Static offset window of block-diagonal bucket d: an entry at
    (row, row+off) lands in bucket ((row mod 128) + off) >> 7, so bucket
    d only sees off in [128d-127, 128d+127] (clipped to the band)."""
    return (max(-band, LANES * d - (LANES - 1)),
            min(band, LANES * d + (LANES - 1)))


def _hash_finish(h, seed, thresh):
    h = h + jnp.uint32(seed) * jnp.uint32(0xC2B2AE3D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 16)
    return h < jnp.uint32(thresh)


def _bucket_masks(t, n, band, sub, d, thresh, seed):
    """Per-tile masks for ONE bucket, on its static offset window.

    Returns (i, offs, md, me): md = stored entries of bucket d
    (edges + the diagonal when d == 0), me = edges only (for degree)."""
    R = sub * LANES
    w_lo, w_hi = _bucket_window(band, d)
    i = t * R + jnp.arange(R, dtype=jnp.int32)
    offs = jnp.arange(w_lo, w_hi + 1, dtype=jnp.int32)
    j = i[:, None] + offs[None, :]
    row_ok = i < n
    inb = (j >= 0) & (j < n) & (offs[None, :] != 0) & row_ok[:, None]
    lo = jnp.minimum(i[:, None], j)
    hi = jnp.maximum(i[:, None], j)
    h = (
        jnp.maximum(lo, 0).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + jnp.maximum(hi, 0).astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    )
    in_bucket = (((i[:, None] & (LANES - 1)) + offs[None, :]) >> 7) == d
    me = inb & _hash_finish(h, seed, thresh) & in_bucket
    md = me
    if w_lo <= 0 <= w_hi:  # the diagonal lands in bucket 0's window
        md = md | ((offs[None, :] == 0) & row_ok[:, None] & in_bucket)
    return i, offs, md, me


@functools.partial(
    jax.jit,
    static_argnames=("n", "band", "sub", "n_tiles", "nD", "d_min",
                     "thresh", "seed"),
)
def _probe_caps(n, band, sub, n_tiles, nD, d_min, thresh, seed):
    """Phase 1: exact global per-bucket slice counts (max over all rows
    of the per-(row, d) entry count) — a handful of scalars read back so
    phase 2 can lay slices out with zero slack."""

    def tile_fn(t):
        caps_t = []
        for bi in range(nD):
            _, _, md, _ = _bucket_masks(
                t, n, band, sub, d_min + bi, thresh, seed
            )
            caps_t.append(md.sum(axis=1).max())
        return jnp.stack(caps_t)

    per_tile = jax.lax.map(tile_fn, jnp.arange(n_tiles, dtype=jnp.int32))
    return per_tile.max(axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("n", "band", "sub", "n_tiles", "caps", "d_min",
                     "thresh", "seed", "store_dt"),
)
def _build_device(n, band, sub, n_tiles, caps, d_min, thresh, seed,
                  store_dt):
    nD = len(caps)

    def tile_fn(t):
        per_bucket = [
            _bucket_masks(t, n, band, sub, d_min + bi, thresh, seed)
            for bi in range(nD)
        ]
        # buckets partition the edges, so the row degree is the sum of
        # the per-bucket edge counts
        degree = functools.reduce(
            jnp.add, [me.sum(axis=1) for (_, _, _, me) in per_bucket]
        ).astype(jnp.float32)

        v_chunks, l_chunks = [], []
        overflow = jnp.asarray(False)
        nnz_t = jnp.asarray(0, jnp.int32)
        for bi, (i, offs, md, _) in enumerate(per_bucket):
            cap = caps[bi]
            nnz_t = nnz_t + md.sum()
            cnt = jnp.cumsum(md, axis=1)
            overflow = overflow | jnp.any(md & (cnt > cap))
            # rank of each stored entry within (row, bucket); -1 (one_hot
            # -> all-zero row) elsewhere
            rank = jnp.where(md, cnt - 1, -1)
            oh = jax.nn.one_hot(rank, cap, dtype=jnp.bfloat16)
            val = jnp.where(
                offs[None, :] == 0, degree[:, None] + 1.0, -1.0
            ).astype(jnp.bfloat16)
            lidx = ((i[:, None] + offs[None, :]) & (LANES - 1)).astype(
                jnp.bfloat16
            )
            # (R, w) x (R, w, cap) -> (R, cap): exact — one nonzero
            # one-hot term per (row, k), operands integral and <= 255
            planes = jnp.einsum(
                "rw,rwk->rk", val, oh,
                preferred_element_type=jnp.float32,
            )
            lplanes = jnp.einsum(
                "rw,rwk->rk", lidx, oh,
                preferred_element_type=jnp.float32,
            )
            v_chunks.append(
                planes.T.reshape(cap, sub, LANES).astype(store_dt)
            )
            l_chunks.append(
                lplanes.T.reshape(cap, sub, LANES).astype(jnp.int8)
            )
        vals = jnp.concatenate(v_chunks)     # (s_gen, sub, 128)
        lidx = jnp.concatenate(l_chunks)
        return vals, lidx, nnz_t, overflow

    vals, lidx, nnz_t, over = jax.lax.map(
        tile_fn, jnp.arange(n_tiles, dtype=jnp.int32)
    )
    return vals, lidx, nnz_t.sum(), over.any()


def rgl_bslab(
    n: int,
    band: int = 512,
    deg: float = 16.0,
    seed: int = 1,
    *,
    policy: Optional[DTypePolicy] = None,
    sub: int = 64,
    impl: str = "auto",
) -> Tuple[BslabMatrix, int]:
    """Build the RGL matrix directly as a device BslabMatrix.

    Returns (matrix, nnz). b = A @ 1 == ones with exact solution x == 1
    (host/rgl.py), so callers need no row-count vector.
    """
    policy = default_policy(policy)
    if band < 1 or band >= n:
        raise ValueError(f"band must be in [1, n); got {band} for n={n}")
    prof = os.environ.get("SB_RGL_PROF")
    t_last = time.perf_counter()

    def mark(label):
        nonlocal t_last
        if prof:
            now = time.perf_counter()
            print(f"[rgl] {label}: {now - t_last:.1f}s", flush=True)
            t_last = now

    lead = sub
    R = sub * LANES
    n_tiles = max(1, -(-n // R))
    nb = max(1, -(-n // LANES))
    x_rows = lead + nb + sub
    d_min = -((band + LANES - 1) // LANES)
    d_max = (LANES - 1 + band) // LANES
    nD = d_max - d_min + 1
    thresh = int(threshold(band, deg))
    # phase 1: exact per-bucket capacities (zero layout slack)
    caps = tuple(
        max(1, int(c)) for c in np.asarray(
            _probe_caps(n, band, sub, n_tiles, nD, d_min, thresh, seed)
        )
    )
    mark("phase1 probe (compile+exec)")
    s_gen = int(sum(caps))
    store_dt = (
        jnp.dtype(jnp.bfloat16)
        if np.dtype(policy.value) == np.float32
        else jnp.dtype(policy.value)
    )
    vals, lidx, nnz_dev, over = _build_device(
        n, band, sub, n_tiles, caps, d_min, thresh, seed, store_dt,
    )
    if bool(over):
        raise SystemExit(
            f"RGL build overflowed the probed slice caps {caps} for "
            f"seed={seed} — phase-1/phase-2 disagreement (bug)"
        )
    nnz = int(nnz_dev)
    mark("phase2 build (compile+exec)")

    # slice metadata: bucket bi (d = d_min + bi) occupies static positions
    # [sum(caps[:bi]), sum(caps[:bi+1])); dbase = sub*t + d + lead
    pos_d = np.concatenate(
        [np.full(c, d_min + bi, np.int64) for bi, c in enumerate(caps)]
    )
    t_np = np.arange(n_tiles, dtype=np.int64)
    dbase = np.clip(
        sub * t_np[:, None] + pos_d[None, :] + lead, 0, x_rows - sub
    )
    meta_gen = dbase.astype(np.int32)[:, :, None]
    lo, hi = dbase.min(axis=1), dbase.max(axis=1)
    w_blocks, wchunk, xw_rows = _window_plan(n_tiles, lo, hi, sub)

    mark("host metadata + window plan")
    resolved = BslabMatrix._resolve_impl(impl, policy, 0, s_gen, sub, x_rows)
    obj = BslabMatrix(
        meta_aff=jnp.zeros((n_tiles, 0, 2), jnp.int32),
        vals_aff=jnp.zeros((n_tiles, 0, sub, LANES), store_dt),
        meta_gen=jnp.asarray(meta_gen),
        vals_gen=vals,
        lidx_gen=lidx,
        wchunk=jnp.asarray(wchunk),
        nr=n, nc=n, nnz=nnz,
        n_tiles=n_tiles, s_aff=0, s_gen=s_gen, sub=sub,
        x_rows=x_rows, w_blocks=w_blocks, xw_rows=xw_rows,
        n_elems=n_tiles * s_gen * sub * LANES,
        impl=resolved,
        start_row=0, total_nr=n, total_nnz=nnz,
    )
    mark("pytree assembly + transfers")
    return obj, nnz
