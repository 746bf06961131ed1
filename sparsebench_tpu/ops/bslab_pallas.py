"""Pallas TPU kernel for the BSLAB (slab-table BSELL) format.

Successor to ops/bsell_pallas.py addressing its measured bottleneck
(NOTES.md round-2: per-slice x-table assembly — 8 scattered single-row
VMEM loads + a concat serving 2 ops of real work). The slab layout makes
the table ONE contiguous load:

  * rows group 128 per lane-group, 8 lane-groups per (8,128) output tile
    (as BSELL);
  * entries bucket by **block-diagonal** d = (col/128) - (row/128): within
    a slice, sublane s (lane-group 8t+s) reads x block 8t + s + d — so the
    (8,128) lookup table is exactly rows [8t+d, 8t+d+8) of x viewed as
    (nrows, 128): one (possibly sublane-unaligned) dynamic slice;
  * slices come in two classes, statically partitioned per matrix:
      - **affine** (s_aff planes): every entry's lane index satisfies
        lidx = (lane + r) & 127 for one per-slice scalar r — true for
        every diagonal's A/B part, i.e. all stencil slices. The index
        plane is NOT stored; the kernel computes it from an iota. Streamed
        bytes: values only.
      - **general** (s_gen planes): stored int8 lane-index plane, as BSELL.

Per-slice scalar metadata (dbase = slab start row in the padded x space,
r) streams per tile into SMEM. x is padded with LEAD=8 leading block-rows
(and a trailing pad) so every slab of a *real* entry is in bounds; padding
slices point at row 0 and multiply by 0.

Two x-residency variants, as bsell:
  * whole-x (``bslab_spmv``): x2d VMEM-resident;
  * chunk-resident windowed (``bslab_spmv_win``): x in HBM, a (2W, 128)
    VMEM scratch holds the tile's two covering W-block chunks, re-DMA'd
    only when the per-tile chunk id changes (the win2 design proven in
    round 2); dbase is stored absolute and rebased by wchunk[t]*W
    in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE_ROWS = LANES * SUBLANES
LEAD = 8  # leading x pad rows so slabs of real entries never underflow

_UNROLL_LIMIT = 96


def _accumulate(get_slab, base, meta_a_ref, va_ref, meta_g_ref, vg_ref,
                lg_ref, y_ref, *, s_aff: int, s_gen: int):
    iota2d = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    acc0 = jnp.zeros((SUBLANES, LANES), y_ref.dtype)

    def aff_body(p, acc):
        tbl = get_slab(meta_a_ref[0, p, 0] - base)
        idx = (iota2d + meta_a_ref[0, p, 1]) & (LANES - 1)
        g = jnp.take_along_axis(tbl, idx, axis=1)
        return acc + va_ref[0, p].astype(acc.dtype) * g

    def gen_body(p, acc):
        tbl = get_slab(meta_g_ref[0, p] - base)
        idx = lg_ref[0, p].astype(jnp.int32)
        g = jnp.take_along_axis(tbl, idx, axis=1)
        return acc + vg_ref[0, p].astype(acc.dtype) * g

    acc = acc0
    if s_aff + s_gen <= _UNROLL_LIMIT:
        for p in range(s_aff):
            acc = aff_body(p, acc)
        for p in range(s_gen):
            acc = gen_body(p, acc)
    else:
        if s_aff:
            acc = jax.lax.fori_loop(0, s_aff, aff_body, acc)
        if s_gen:
            acc = jax.lax.fori_loop(0, s_gen, gen_body, acc)
    y_ref[0] = acc


def _specs(s_aff: int, s_gen: int):
    """BlockSpecs for (meta_aff, vals_aff, meta_gen, vals_gen, lidx_gen) —
    entries are None for an empty class (operand omitted entirely)."""
    meta_a = vals_a = meta_g = vals_g = lidx_g = None
    if s_aff:
        meta_a = pl.BlockSpec((1, s_aff, 2), lambda t: (t, 0, 0),
                              memory_space=pltpu.SMEM)
        vals_a = pl.BlockSpec((1, s_aff, SUBLANES, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    if s_gen:
        meta_g = pl.BlockSpec((1, s_gen), lambda t: (t, 0),
                              memory_space=pltpu.SMEM)
        vals_g = pl.BlockSpec((1, s_gen, SUBLANES, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        lidx_g = pl.BlockSpec((1, s_gen, SUBLANES, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    return meta_a, vals_a, meta_g, vals_g, lidx_g


class _NullRef:
    """Placeholder ref for an empty slice class (never indexed: the
    matching loop has zero iterations)."""

    def __getitem__(self, _):  # pragma: no cover - never reached
        raise IndexError("empty slice class")


def _pack(args, s_aff, s_gen):
    """Order the present operands (meta_a, vals_a, meta_g, vals_g, lidx_g)."""
    meta_a, vals_a, meta_g, vals_g, lidx_g = args
    out = []
    if s_aff:
        out += [meta_a, vals_a]
    if s_gen:
        out += [meta_g, vals_g, lidx_g]
    return out


def _unpack(refs, s_aff, s_gen):
    refs = list(refs)
    null = _NullRef()
    meta_a = refs.pop(0) if s_aff else null
    vals_a = refs.pop(0) if s_aff else null
    meta_g = refs.pop(0) if s_gen else null
    vals_g = refs.pop(0) if s_gen else null
    lidx_g = refs.pop(0) if s_gen else null
    return meta_a, vals_a, meta_g, vals_g, lidx_g, refs


def _kernel_whole(*refs, s_aff: int, s_gen: int):
    meta_a, vals_a, meta_g, vals_g, lidx_g, rest = _unpack(
        refs[:-1], s_aff, s_gen
    )
    x_ref = rest[0]
    y_ref = refs[-1]
    _accumulate(
        lambda b: x_ref[pl.ds(b, SUBLANES), :], jnp.int32(0),
        meta_a, vals_a, meta_g, vals_g, lidx_g, y_ref,
        s_aff=s_aff, s_gen=s_gen,
    )


@functools.partial(jax.jit, static_argnames=("s_aff", "s_gen", "interpret"))
def bslab_spmv(
    meta_aff,   # (n_tiles, s_aff, 2) int32: [dbase(padded rows), r]
    vals_aff,   # (n_tiles, s_aff, 8, 128) value dtype
    meta_gen,   # (n_tiles, s_gen) int32: dbase
    vals_gen,   # (n_tiles, s_gen, 8, 128)
    lidx_gen,   # (n_tiles, s_gen, 8, 128) int8
    x2d,        # (x_rows, 128) padded: LEAD zero rows, data, trailing pad
    s_aff: int,
    s_gen: int,
    interpret: bool = False,
):
    """Whole-x-in-VMEM slab SpMV. Returns y as (n_tiles, 8, 128)."""
    n_tiles = (vals_aff if s_aff else vals_gen).shape[0]
    specs = _specs(s_aff, s_gen)
    in_specs = _pack(specs, s_aff, s_gen) + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ]
    args = _pack((meta_aff, vals_aff, meta_gen, vals_gen, lidx_gen),
                 s_aff, s_gen) + [x2d]
    return pl.pallas_call(
        functools.partial(_kernel_whole, s_aff=s_aff, s_gen=s_gen),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES),
                                       x2d.dtype),
        interpret=interpret,
    )(*args)


def _kernel_win(*refs, s_aff: int, s_gen: int, w_blocks: int):
    # operand order: wchunk, [class operands...], x_hbm | y | scratch...
    wchunk_ref = refs[0]
    meta_a, vals_a, meta_g, vals_g, lidx_g, rest = _unpack(
        refs[1:-4], s_aff, s_gen
    )
    x_hbm = rest[0]
    y_ref, xbuf, sem, prev_ref = refs[-4:]
    t = pl.program_id(0)
    c = wchunk_ref[t]

    @pl.when(jnp.logical_or(t == 0, c != prev_ref[0]))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * w_blocks, 2 * w_blocks), :], xbuf, sem
        )
        cp.start()
        cp.wait()

    prev_ref[0] = c

    _accumulate(
        lambda b: xbuf[pl.ds(b, SUBLANES), :], c * w_blocks,
        meta_a, vals_a, meta_g, vals_g, lidx_g, y_ref,
        s_aff=s_aff, s_gen=s_gen,
    )


@functools.partial(
    jax.jit,
    static_argnames=("s_aff", "s_gen", "w_blocks", "interpret"),
)
def bslab_spmv_win(
    wchunk,     # (n_tiles,) int32 per-tile covering-chunk index
    meta_aff,
    vals_aff,
    meta_gen,
    vals_gen,
    lidx_gen,
    x2d,        # ((max wchunk + 2) * W, 128): padded x in HBM
    s_aff: int,
    s_gen: int,
    w_blocks: int,
    interpret: bool = False,
):
    """Chunk-resident windowed slab SpMV (win2 design, see module doc)."""
    n_tiles = (vals_aff if s_aff else vals_gen).shape[0]
    specs = _specs(s_aff, s_gen)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + _pack(
        specs, s_aff, s_gen
    ) + [pl.BlockSpec(memory_space=pltpu.HBM)]
    args = [wchunk] + _pack(
        (meta_aff, vals_aff, meta_gen, vals_gen, lidx_gen), s_aff, s_gen
    ) + [x2d]
    return pl.pallas_call(
        functools.partial(
            _kernel_win, s_aff=s_aff, s_gen=s_gen, w_blocks=w_blocks
        ),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES),
                                       x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * w_blocks, LANES), x2d.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
