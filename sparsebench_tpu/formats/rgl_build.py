"""Device-side builder: RGL (random-graph Laplacian) -> BslabMatrix.

The host->device relay moves ~0.3-3 MB/s, so a >=10^7-nnz irregular
matrix cannot be uploaded (VERDICT r2 #2) — it is generated and laid out
entirely ON DEVICE from the (n, band, deg, seed) spec in host/rgl.py:

  * per tile of ``sub``*128 rows, the (rows x offsets) edge mask is pure
    u32 hash arithmetic on iota grids (no scatter, no gather);
  * the BSLAB slice layout uses STATIC per-block-diagonal capacity caps
    measured EXACTLY by a cheap phase-1 device pass (global max of the
    per-(row, d) entry count — a handful of scalars read back), so every
    slice plane in phase 2 is a masked REDUCTION over the offset axis —
    slice k of bucket d selects entries whose within-(row, d) cumulative
    count equals k+1. Static positions -> a plain stack, no dynamic
    updates, zero layout slack beyond the matrix's own row-count skew;
  * a device-side overflow check cross-validates the two phases.

All slices are general (stored int8 lane indices) — the matrix is
irregular by design. Values are -1 / degree+1 <= 255, exactly
representable in bf16, so compression is lossless by construction.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.base import default_policy
from sparsebench_tpu.formats.bslab import BslabMatrix, _window_plan
from sparsebench_tpu.host.rgl import threshold
from sparsebench_tpu.ops.bslab_pallas import LANES


def _tile_masks(t, n, band, sub, offs):
    """Shared per-tile mask/value computation — the host/rgl.py spec in
    jnp (mix32 on iota grids)."""
    R = sub * LANES
    i = t * R + jnp.arange(R, dtype=jnp.int32)
    j = i[:, None] + offs[None, :]
    row_ok = i < n
    inb = (j >= 0) & (j < n) & (offs[None, :] != 0) & row_ok[:, None]
    lo = jnp.minimum(i[:, None], j)
    hi = jnp.maximum(i[:, None], j)
    h = (
        jnp.maximum(lo, 0).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + jnp.maximum(hi, 0).astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    )
    return i, j, row_ok, inb, h


def _hash_finish(h, seed, thresh):
    h = h + jnp.uint32(seed) * jnp.uint32(0xC2B2AE3D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 16)
    return h < jnp.uint32(thresh)


@functools.partial(
    jax.jit,
    static_argnames=("n", "band", "sub", "n_tiles", "nD", "d_min",
                     "thresh", "seed"),
)
def _probe_caps(n, band, sub, n_tiles, nD, d_min, thresh, seed):
    """Phase 1: exact global per-bucket slice counts (max over all rows
    of the per-(row, d) entry count) — a handful of scalars read back so
    phase 2 can lay slices out with zero slack."""
    offs = jnp.arange(-band, band + 1, dtype=jnp.int32)

    def tile_fn(t):
        i, j, row_ok, inb, h = _tile_masks(t, n, band, sub, offs)
        edge = inb & _hash_finish(h, seed, thresh)
        mask = edge | ((offs[None, :] == 0) & row_ok[:, None])
        d_full = ((i[:, None] & (LANES - 1)) + offs[None, :]) >> 7
        caps_t = []
        for bi in range(nD):
            md = mask & (d_full == d_min + bi)
            cnt = jnp.cumsum(md, axis=1)
            caps_t.append(jnp.max(jnp.where(md, cnt, 0)))
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
    offs = jnp.arange(-band, band + 1, dtype=jnp.int32)

    def tile_fn(t):
        i, j, row_ok, inb, h = _tile_masks(t, n, band, sub, offs)
        edge = inb & _hash_finish(h, seed, thresh)
        degree = edge.sum(axis=1).astype(jnp.float32)
        mask = edge | ((offs[None, :] == 0) & row_ok[:, None])
        val = jnp.where(offs[None, :] == 0, degree[:, None] + 1.0, -1.0)
        val = jnp.where(mask, val, 0.0)
        lidx_full = ((i[:, None] + offs[None, :]) & (LANES - 1)).astype(
            jnp.int32
        )
        d_full = ((i[:, None] & (LANES - 1)) + offs[None, :]) >> 7

        v_planes, l_planes = [], []
        overflow = jnp.asarray(False)
        for bi in range(nD):
            dval = d_min + bi
            md = mask & (d_full == dval)
            cnt = jnp.cumsum(md, axis=1)
            overflow = overflow | jnp.any(
                jnp.where(md, cnt, 0) > caps[bi]
            )
            for k in range(caps[bi]):
                sel = md & (cnt == (k + 1))
                v_planes.append(
                    (val * sel).sum(axis=1).astype(store_dt).reshape(
                        sub, LANES
                    )
                )
                l_planes.append(
                    (lidx_full * sel).sum(axis=1).astype(jnp.int8).reshape(
                        sub, LANES
                    )
                )
        vals = jnp.stack(v_planes)          # (s_gen, sub, 128)
        lidx = jnp.stack(l_planes)
        nnz_t = mask.sum()
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
    return obj, nnz
