"""Pallas TPU kernel for the BSELL (block-column SELL) format.

The only gather Mosaic runs at full vector speed is along the 128-lane
axis (``take_along_axis(..., axis=1)``); arbitrary cross-sublane gathers
don't exist, and XLA's general gather measures ~1 GB/s on v5e. BSELL
restructures general SpMV so every gather is a lane-gather:

  * rows are grouped 128 per lane-group, 8 lane-groups per (8, 128) tile;
  * each row's entries are bucketed by 128-wide *column block*; per
    (lane-group, block) the rows pad to the longest count, producing
    "slices": a slice holds, for all 128 rows of the group, one entry whose
    column lies in one known block — per sublane its own block;
  * the kernel keeps the whole x vector VMEM-resident as (nc/128, 128);
    per slice it assembles an (8, 128) lookup table from the 8 per-sublane
    block rows of x (static-count dynamic slices) and gathers with the
    slice's 7-bit local indices — one lane-gather + one fma per slice.

Data streamed per nonzero: value + local index (the 7-bit index is stored
as int8 by default — 5 B/nnz, vs the 12 B/nnz value+column model of the
reference formats, src/main.c:187-189).

Constraint: x2d must fit in VMEM alongside the slice blocks (roughly
nc <= ~2M rows at f32). The format falls back to its XLA path otherwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE_ROWS = LANES * SUBLANES  # 1024 rows per (8, 128) output tile


_UNROLL_LIMIT = 96


def _bsell_kernel(blocks_ref, x_ref, val_ref, lidx_ref, y_ref, *, s_max: int):
    acc0 = jnp.zeros((SUBLANES, LANES), y_ref.dtype)

    def body(p, acc):
        rows = [
            x_ref[pl.ds(blocks_ref[0, p, s], 1), :] for s in range(SUBLANES)
        ]
        tbl = jnp.concatenate(rows, axis=0)  # (8, 128) lookup table
        idx = lidx_ref[0, p].astype(jnp.int32)
        g = jnp.take_along_axis(tbl, idx, axis=1)
        # values may be stored compressed (bf16); accumulate in x dtype
        return acc + val_ref[0, p].astype(acc.dtype) * g

    if s_max <= _UNROLL_LIMIT:
        # static unroll: slice positions become compile-time constants
        # (dynamic per-iteration VMEM slices measured ~5x slower)
        acc = acc0
        for p in range(s_max):
            acc = body(p, acc)
        y_ref[0] = acc
    else:
        y_ref[0] = jax.lax.fori_loop(0, s_max, body, acc0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsell_spmv_pallas(
    blocks: jnp.ndarray,   # (n_tiles, S_max, 8) int32 block-id table
    x2d: jnp.ndarray,      # (nc_pad/128, 128) value dtype, VMEM resident
    vals: jnp.ndarray,     # (n_tiles, S_max, 8, 128) value dtype
    lidx: jnp.ndarray,     # (n_tiles, S_max, 8, 128) int8/int32 lane indices
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns y as (n_tiles, 8, 128).

    The block-id table streams per tile into SMEM (a scalar-prefetch
    operand would pin the WHOLE table in the 1 MB SMEM — it overflows past
    ~100k rows); dynamic-slice indices read from an SMEM block are fine.
    """
    n_tiles, s_max = vals.shape[0], vals.shape[1]
    kernel = functools.partial(_bsell_kernel, s_max=s_max)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, s_max, SUBLANES),
                lambda t: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d, whole vector
            pl.BlockSpec(
                (1, s_max, SUBLANES, LANES),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s_max, SUBLANES, LANES),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), x2d.dtype),
        interpret=interpret,
    )(blocks, x2d, vals, lidx)
