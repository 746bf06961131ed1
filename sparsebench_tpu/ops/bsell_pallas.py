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

Two variants: whole-x (x VMEM-resident, nc <= ~2M rows at f32) and
windowed (``bsell_spmv_windowed``): x is chunked into W-block pieces and
each tile's two covering chunks arrive as pipelined operands addressed by a
scalar-prefetched per-tile chunk table, so arbitrarily large x streams
through VMEM with automatic double buffering.
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


def _accumulate_slices(get_row, blocks_ref, base, val_ref, lidx_ref, y_ref,
                       s_max: int):
    """Shared slice loop: per slice, build the (8,128) lookup table from 8
    per-sublane x rows fetched by ``get_row``, lane-gather, fma."""
    acc0 = jnp.zeros((SUBLANES, LANES), y_ref.dtype)

    def body(p, acc):
        rows = [
            get_row(blocks_ref[0, p, s] + base) for s in range(SUBLANES)
        ]
        tbl = jnp.concatenate(rows, axis=0).reshape(SUBLANES, LANES)
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


def _bsell_kernel(blocks_ref, base_ref, x_ref, val_ref, lidx_ref, y_ref, *,
                  s_max: int):
    base = base_ref[0, 0, 0]
    _accumulate_slices(
        lambda b: x_ref[pl.ds(b, 1), :], blocks_ref, base, val_ref, lidx_ref,
        y_ref, s_max,
    )


def _bsell_kernel_windowed(
    wchunk_ref, blocks_ref, val_ref, lidx_ref, x_lo, x_hi, y_ref,
    *, s_max: int, w_blocks: int,
):
    # Beyond-VMEM x: the pipeline stages two adjacent W-block chunks of x
    # per tile (chunk ids wchunk[t], wchunk[t]+1 via scalar-prefetch index
    # maps). Block ids in blocks_ref are relative to wchunk[t]*W, so they
    # lie in [0, 2W): rows < W come from x_lo, the rest from x_hi. Both
    # candidate rows are fetched (512 B VMEM reads) and lane-selected —
    # cheaper than a conditional, and there is no manual DMA left to
    # miscompile inside lax loop bodies (the round-1 windowed kernel's
    # in-kernel make_async_copy crashed the TPU worker at 200^3).
    del wchunk_ref  # consumed by the index maps only

    def get_row(b):
        lo = x_lo[pl.ds(jnp.clip(b, 0, w_blocks - 1), 1), :]
        hi = x_hi[pl.ds(jnp.clip(b - w_blocks, 0, w_blocks - 1), 1), :]
        return jnp.where(b < w_blocks, lo, hi)

    _accumulate_slices(
        get_row, blocks_ref, jnp.int32(0), val_ref, lidx_ref, y_ref, s_max
    )


def _common_specs(s_max):
    """BlockSpecs shared by both kernels: the block-id table streams per
    tile into SMEM (a scalar-prefetch operand would pin the WHOLE table in
    the 1 MB SMEM — it overflows past ~100k rows), as does the per-tile
    window base; slice data blocks stream into VMEM."""
    return (
        pl.BlockSpec(
            (1, s_max, SUBLANES), lambda t: (t, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec((1, 1, SUBLANES), lambda t: (t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, s_max, SUBLANES, LANES), lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, s_max, SUBLANES, LANES), lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsell_spmv_pallas(
    blocks: jnp.ndarray,   # (n_tiles, S_max, 8) int32 window-relative blocks
    win_base: jnp.ndarray,  # (n_tiles, 1, 8) int32 per-tile window base (replicated)
    x2d: jnp.ndarray,      # (nc_pad/128, 128) value dtype, VMEM resident
    vals: jnp.ndarray,     # (n_tiles, S_max, 8, 128) value dtype
    lidx: jnp.ndarray,     # (n_tiles, S_max, 8, 128) int8/int32 lane indices
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-x-in-VMEM variant. Returns y as (n_tiles, 8, 128)."""
    n_tiles, s_max = vals.shape[0], vals.shape[1]
    b_spec, base_spec, v_spec, l_spec = _common_specs(s_max)
    return pl.pallas_call(
        functools.partial(_bsell_kernel, s_max=s_max),
        grid=(n_tiles,),
        in_specs=[
            b_spec,
            base_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d, whole vector
            v_spec,
            l_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), x2d.dtype),
        interpret=interpret,
    )(blocks, win_base, x2d, vals, lidx)


def _bsell_kernel_win2(
    wchunk_ref, blocks_ref, val_ref, lidx_ref, x_hbm, y_ref,
    xbuf, sem, prev_ref, *, s_max: int, w_blocks: int,
):
    """Chunk-resident windowed variant: the two covering x chunks live in
    one flat VMEM scratch, re-DMA'd only when the tile's chunk id changes
    (the window crawls on banded/local matrices — ~1 fetch per ~12 tiles
    at 200^3). Every per-sublane row fetch is then a single load from the
    scratch, versus the pipelined-operand variant's two loads + select
    (the dual fetch measured ~2x the whole-x kernel's per-slice cost).
    State across grid steps (prev chunk id) sits in SMEM scratch; the
    grid is sequential on TPU. The x scratch is 2-D (2W, 128) and always
    copied WHOLE (the DMA target is the full ref, never a slice), so no
    slot-slice tile-alignment issue arises; row reads use the same
    `ref[pl.ds(b, 1), :]` pattern as the proven whole-x kernel."""
    t = pl.program_id(0)
    c = wchunk_ref[t]

    @pl.when(jnp.logical_or(t == 0, c != prev_ref[0]))
    def _():
        # whole-scratch DMA target + 2-D row-granular HBM source: both
        # sides tile-aligned (W is a multiple of 8 rows)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * w_blocks, 2 * w_blocks), :], xbuf, sem
        )
        cp.start()
        cp.wait()

    prev_ref[0] = c

    def get_row(b):
        return xbuf[pl.ds(b, 1), :]  # same pattern as the whole-x kernel

    _accumulate_slices(
        get_row, blocks_ref, jnp.int32(0), val_ref, lidx_ref, y_ref, s_max
    )


@functools.partial(jax.jit, static_argnames=("w_blocks", "interpret"))
def bsell_spmv_win2(
    wchunk: jnp.ndarray,    # (n_tiles,) int32 per-tile x chunk index
    blocks: jnp.ndarray,    # (n_tiles, S_max, 8) int32 chunk-relative blocks
    x2d: jnp.ndarray,       # ((max wchunk + 2) * W, 128) value dtype
    vals: jnp.ndarray,
    lidx: jnp.ndarray,
    w_blocks: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chunk-resident windowed SpMV (see _bsell_kernel_win2)."""
    n_tiles, s_max = vals.shape[0], vals.shape[1]
    b_spec, _base_spec, v_spec, l_spec = _common_specs(s_max)
    return pl.pallas_call(
        functools.partial(
            _bsell_kernel_win2, s_max=s_max, w_blocks=w_blocks
        ),
        grid=(n_tiles,),
        in_specs=[
            # whole (n_tiles,) chunk table in SMEM (31 KB at 200^3)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            b_spec,
            v_spec,
            l_spec,
            pl.BlockSpec(memory_space=pltpu.HBM),  # x, unblocked 2-D
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * w_blocks, LANES), x2d.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(wchunk, blocks, vals, lidx, x2d)


@functools.partial(jax.jit, static_argnames=("w_blocks", "interpret"))
def bsell_spmv_windowed(
    wchunk: jnp.ndarray,    # (n_tiles,) int32 per-tile x chunk index
    blocks: jnp.ndarray,    # (n_tiles, S_max, 8) int32 chunk-relative blocks
    x2d: jnp.ndarray,       # ((max wchunk + 2) * W, 128) value dtype
    vals: jnp.ndarray,
    lidx: jnp.ndarray,
    w_blocks: int,          # W: x chunk size in 128-lane blocks
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed variant for x too large for VMEM. Returns (n_tiles, 8, 128).

    x is viewed as chunks of W block-rows; tile t's column span (guaranteed
    <= W by the builder) lies inside chunks [wchunk[t], wchunk[t]+1], which
    arrive as two pipelined operands whose index maps read the prefetched
    wchunk table. Mosaic double-buffers them and skips the copy entirely
    when consecutive tiles keep the same chunk — on banded/local matrices
    the window crawls, so x traffic stays ~one pass over x.
    """
    n_tiles, s_max = vals.shape[0], vals.shape[1]
    # prefetch arg is appended to every index map's parameters
    b_spec = pl.BlockSpec(
        (1, s_max, SUBLANES), lambda t, wb: (t, 0, 0),
        memory_space=pltpu.SMEM,
    )
    v_spec = pl.BlockSpec(
        (1, s_max, SUBLANES, LANES), lambda t, wb: (t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    l_spec = pl.BlockSpec(
        (1, s_max, SUBLANES, LANES), lambda t, wb: (t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            b_spec,
            v_spec,
            l_spec,
            pl.BlockSpec((w_blocks, LANES), lambda t, wb: (wb[t], 0)),
            pl.BlockSpec((w_blocks, LANES), lambda t, wb: (wb[t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda t, wb: (t, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _bsell_kernel_windowed, s_max=s_max, w_blocks=w_blocks
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), x2d.dtype),
        interpret=interpret,
    )(wchunk, blocks, vals, lidx, x2d, x2d)
