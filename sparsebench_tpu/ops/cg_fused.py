"""Fused CG vector-update kernel (single-reduction loop, cg_cs_loop).

The Chronopoulos-Gear body runs four dependent axpys per iteration:

    p = u + beta p;  s = w + beta s;  x = x + alpha p;  r = r - alpha s

As separate XLA ops that is 12 full-vector transfers and four kernel
launches; inside a fused while_loop on this chip the fixed per-op cost
(~10-20 us) dominates at 100^3 where each op moves only ~5 MB. This
kernel does all four in ONE pass: 6 reads + 4 writes, one launch.

Generic over equal-length flat f32/bf16 vectors whose (len/128) row
count is a multiple of 8 — true by construction for the stencil padded
vector space (ops/stencil_pallas.py pad_dims) and for any 1024-multiple
length. alpha/beta ride in a (1, 2) SMEM operand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per block: 10 blocked operands x blk x 128 x 4 B, DOUBLED by the
# Pallas pipeline's multi-buffering, must stay under the ~16 MB default
# scoped-VMEM allowance -> blk <= 12 MB / (10 * 512 * 2) ~= 1228
_MAX_BLK = 1024


def supports_fused_rows(n: int) -> bool:
    return n % (8 * LANES) == 0


def _pick_blk(rows: int) -> int:
    best = 8
    for blk in range(8, min(rows, _MAX_BLK) + 1, 8):
        if rows % blk == 0:
            best = blk
    return best


def _cs_update_kernel(ab, u, p, w, s, x, r, p2, s2, x2, r2):
    al = ab[0, 0]
    be = ab[0, 1]
    dt = u.dtype
    pv = u[...] + be.astype(dt) * p[...]
    sv = w[...] + be.astype(dt) * s[...]
    p2[...] = pv
    s2[...] = sv
    x2[...] = x[...] + al.astype(dt) * pv
    r2[...] = r[...] - al.astype(dt) * sv


@functools.partial(jax.jit, static_argnames=("interpret",))
def cs_update_pallas(u, p, w, s, x, r, alpha, beta, interpret: bool = False):
    """One-pass (p', s', x', r') for the cg_cs_loop body."""
    n = u.shape[0]
    rows = n // LANES
    assert supports_fused_rows(n), n
    blk = _pick_blk(rows)
    grid = rows // blk
    vec = pl.BlockSpec((blk, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    ab = jnp.stack([alpha, beta]).astype(jnp.float32).reshape(1, 2)
    args = [v.reshape(rows, LANES) for v in (u, p, w, s, x, r)]
    shape = jax.ShapeDtypeStruct((rows, LANES), u.dtype)
    outs = pl.pallas_call(
        _cs_update_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + [vec] * 6,
        out_specs=[vec] * 4,
        out_shape=[shape] * 4,
        interpret=interpret,
    )(ab, *args)
    return tuple(o.reshape(-1) for o in outs)
