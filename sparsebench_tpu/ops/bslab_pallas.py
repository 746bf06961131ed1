"""Pallas TPU kernel for the BSLAB (slab-table BSELL) format.

Successor to ops/bsell_pallas.py. Round-3 microbenchmarks
(benchmarks/slab_micro.py, slab_micro2.py, dev v5e 2026-08-17) showed:

  * the round-2 kernel's per-slice cost (~12 ns per (8,128) slice) is NOT
    the x-table assembly NOTES.md blamed — replacing the 8 scattered row
    loads with one slab load, a static table, or no table at all leaves
    it flat, as does swapping the int8 lane-gather for a dynamic roll or
    nothing, and doubling the value bytes. It is fixed per-iteration
    overhead around 2-6 tiny VPU ops;
  * TALLER slices amortize it: at (64,128) per iteration the unit cost
    drops ~3x and the kernel turns memory-bound — f32 values stream at
    666 GB/s (95% of the chip's measured STREAM triad), bf16+int8 at
    547 GB/s (78%).

Layout (see formats/bslab.py): rows group 128 per lane-group, ``sub``
lane-groups per (sub, 128) tile; entries bucket by block-diagonal
d = col/128 - row/128, so a slice's (sub,128) x-table is ONE contiguous
(row-unaligned) dynamic slice of x at dbase = sub*t + d (+ LEAD pad).
Affine slices (lane index = (lane + r) & 127, one scalar r — every
diagonal A/B part) store no index plane: the kernel applies a dynamic
lane roll. General slices stream an int8 index plane and lane-gather.

Per-slice scalar metadata (dbase, r) streams per tile into SMEM.

x residency: whole-x VMEM (``bslab_spmv``) or the chunk-resident window
proven in round 2 (``bslab_spmv_win``): x in HBM, a (2W,128) VMEM scratch
re-DMA'd only when the per-tile covering-chunk id changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LEAD = 8  # leading x pad rows (min slab underflow guard, multiple of 8)

# Static unroll bound: dynamic (traced) VMEM slice indices in kernel
# loops measured ~4x slower than a static unroll (NOTES.md round 2), and
# the RGL matrix's 107 general slices ran 2.6x slower through the
# fori_loop path (round 3). 192 covers every in-tree workload; beyond it
# the fori fallback still exists.
_UNROLL_LIMIT = 192


def _accumulate(get_slab, base, meta_a_ref, va_ref, meta_g_ref, vg_ref,
                lg_ref, meta_w_ref, vw_ref, lw_ref, dw_ref, y_ref, *,
                s_aff: int, s_gen: int, s_wide: int, wide_k: int, sub: int,
                wide_groups: tuple = ()):
    acc0 = jnp.zeros((sub, LANES), y_ref.dtype)

    # WIDE tables are hoisted: wide slices share anchors per GROUP (the
    # build anchors each group's slices at one block — a kernel
    # contract), so the wide_k shifted (sub,128) tables cost one dynamic
    # VMEM slice + static subslices per GROUP per tile, not per slice.
    # The first implementation sliced dynamically inside the slice loop
    # and the measured per-wide-slice cost was ~320 ns = 9 dynamic
    # slices (chip r4) — 2.5x the whole-tile budget.
    #
    # wide_groups == () is the legacy single-group layout: every wide
    # slice anchored at the d_min block with dblk spanning all nD blocks
    # (wide_k = nD). Non-empty wide_groups lists the per-group slice
    # counts (summing to s_wide, group starts static): span-limited
    # pools whose slices cost wide_k == K gathers each instead of nD —
    # the irregular-matrix gather-wall fix (VERDICT r4 #1).
    groups = tuple(wide_groups) if wide_groups else (
        (s_wide,) if s_wide else ()
    )
    wide_tbl_sets = []
    if s_wide:
        starts = [0]
        for c in groups[:-1]:
            starts.append(starts[-1] + c)
        for p0 in starts:
            # sublane-aligned tall slab; builders extend x coverage
            xw = get_slab(meta_w_ref[0, p0, 0] - base,
                          sub + ((wide_k - 1 + 7) & ~7))
            wide_tbl_sets.append([xw[k:k + sub] for k in range(wide_k)])

    def aff_body(p, acc):
        tbl = get_slab(meta_a_ref[0, p, 0] - base)
        # (lane + r) & 127 as a dynamic lane rotation:
        # roll(x, s)[i] = x[(i - s) % n] -> shift = -r
        g = pltpu.roll(tbl, -meta_a_ref[0, p, 1], axis=1)
        return acc + va_ref[0, p].astype(acc.dtype) * g

    def gen_body(p, acc):
        tbl = get_slab(meta_g_ref[0, p, 0] - base)
        idx = lg_ref[0, p].astype(jnp.int32)
        g = jnp.take_along_axis(tbl, idx, axis=1)
        return acc + vg_ref[0, p].astype(acc.dtype) * g

    def make_wide_body(tbls):
        # WIDE slices relax the one-block-diagonal-per-slice constraint:
        # each element carries a block delta dblk in [0, wide_k) on top
        # of its lane index, gathered as wide_k shifted-slab lane-gathers
        # fused by select (Mosaic's gather is single-vreg-per-dimension,
        # so a true 2-D gather is unavailable). They hold the OVERFLOW
        # tail of rows whose per-(row, d) entry count exceeds the
        # quantile slice caps — the pool that lets irregular matrices
        # (RGL) drop per-bucket capacity from the global max (pad 6.3x)
        # to a quantile (VERDICT r3 next #1).
        def wide_body(p, acc):
            idx = lw_ref[0, p].astype(jnp.int32)
            dblk = dw_ref[0, p].astype(jnp.int32)
            g = jnp.zeros((sub, LANES), acc.dtype)
            for k in range(wide_k):
                g = jnp.where(
                    dblk == k,
                    jnp.take_along_axis(tbls[k], idx, axis=1), g,
                )
            return acc + vw_ref[0, p].astype(acc.dtype) * g

        return wide_body

    acc = acc0
    if s_aff + s_gen + s_wide * wide_k <= _UNROLL_LIMIT:
        for p in range(s_aff):
            acc = aff_body(p, acc)
        for p in range(s_gen):
            acc = gen_body(p, acc)
        p = 0
        for gi, cg in enumerate(groups):
            body = make_wide_body(wide_tbl_sets[gi])
            for _ in range(cg):
                acc = body(p, acc)
                p += 1
    else:
        if s_aff:
            acc = jax.lax.fori_loop(0, s_aff, aff_body, acc)
        if s_gen:
            acc = jax.lax.fori_loop(0, s_gen, gen_body, acc)
        p0 = 0
        for gi, cg in enumerate(groups):
            if cg:
                acc = jax.lax.fori_loop(
                    p0, p0 + cg, make_wide_body(wide_tbl_sets[gi]), acc
                )
            p0 += cg
    y_ref[0] = acc


def _specs(s_aff: int, s_gen: int, s_wide: int, sub: int):
    meta_a = vals_a = meta_g = vals_g = lidx_g = None
    meta_w = vals_w = lidx_w = dblk_w = None
    if s_aff:
        meta_a = pl.BlockSpec((1, s_aff, 2), lambda t: (t, 0, 0),
                              memory_space=pltpu.SMEM)
        vals_a = pl.BlockSpec((1, s_aff, sub, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    if s_gen:
        # 3-D (n_tiles, s_gen, 1): Mosaic requires the last two block
        # dims divisible by (8, 128) OR equal to the array dims — a 2-D
        # (1, s_gen) block with a blocked leading dim violates that
        meta_g = pl.BlockSpec((1, s_gen, 1), lambda t: (t, 0, 0),
                              memory_space=pltpu.SMEM)
        vals_g = pl.BlockSpec((1, s_gen, sub, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        lidx_g = pl.BlockSpec((1, s_gen, sub, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    if s_wide:
        meta_w = pl.BlockSpec((1, s_wide, 1), lambda t: (t, 0, 0),
                              memory_space=pltpu.SMEM)
        vals_w = pl.BlockSpec((1, s_wide, sub, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        lidx_w = pl.BlockSpec((1, s_wide, sub, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        dblk_w = pl.BlockSpec((1, s_wide, sub, LANES),
                              lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    return (meta_a, vals_a, meta_g, vals_g, lidx_g,
            meta_w, vals_w, lidx_w, dblk_w)


class _NullRef:
    """Placeholder for an empty slice class (never indexed)."""

    def __getitem__(self, _):  # pragma: no cover - never reached
        raise IndexError("empty slice class")


def _pack(args, s_aff, s_gen, s_wide):
    meta_a, vals_a, meta_g, vals_g, lidx_g, meta_w, vals_w, lidx_w, \
        dblk_w = args
    out = []
    if s_aff:
        out += [meta_a, vals_a]
    if s_gen:
        out += [meta_g, vals_g, lidx_g]
    if s_wide:
        out += [meta_w, vals_w, lidx_w, dblk_w]
    return out


def _unpack(refs, s_aff, s_gen, s_wide):
    refs = list(refs)
    null = _NullRef()
    meta_a = refs.pop(0) if s_aff else null
    vals_a = refs.pop(0) if s_aff else null
    meta_g = refs.pop(0) if s_gen else null
    vals_g = refs.pop(0) if s_gen else null
    lidx_g = refs.pop(0) if s_gen else null
    meta_w = refs.pop(0) if s_wide else null
    vals_w = refs.pop(0) if s_wide else null
    lidx_w = refs.pop(0) if s_wide else null
    dblk_w = refs.pop(0) if s_wide else null
    return (meta_a, vals_a, meta_g, vals_g, lidx_g,
            meta_w, vals_w, lidx_w, dblk_w, refs)


def _kernel_whole(*refs, s_aff: int, s_gen: int, s_wide: int, wide_k: int,
                  sub: int, wide_groups: tuple = ()):
    (meta_a, vals_a, meta_g, vals_g, lidx_g, meta_w, vals_w, lidx_w,
     dblk_w, rest) = _unpack(refs[:-1], s_aff, s_gen, s_wide)
    x_ref = rest[0]
    y_ref = refs[-1]
    _accumulate(
        lambda b, h=sub: x_ref[pl.ds(b, h), :], jnp.int32(0),
        meta_a, vals_a, meta_g, vals_g, lidx_g,
        meta_w, vals_w, lidx_w, dblk_w, y_ref,
        s_aff=s_aff, s_gen=s_gen, s_wide=s_wide, wide_k=wide_k, sub=sub,
        wide_groups=wide_groups,
    )


@functools.partial(
    jax.jit,
    static_argnames=("s_aff", "s_gen", "s_wide", "wide_k", "sub",
                     "wide_groups", "interpret"),
)
def bslab_spmv(
    meta_aff,   # (n_tiles, s_aff, 2) int32: [dbase (padded rows), r]
    vals_aff,   # (n_tiles, s_aff, sub, 128) value dtype
    meta_gen,   # (n_tiles, s_gen, 1) int32: dbase
    vals_gen,   # (n_tiles, s_gen, sub, 128)
    lidx_gen,   # (n_tiles, s_gen, sub, 128) int8
    meta_wide,  # (n_tiles, s_wide, 1) int32: dbase of dblk == 0
    vals_wide,  # (n_tiles, s_wide, sub, 128)
    lidx_wide,  # (n_tiles, s_wide, sub, 128) int8
    dblk_wide,  # (n_tiles, s_wide, sub, 128) int8 block delta < wide_k
    x2d,        # (x_rows, 128) padded: LEAD zero rows, data, trailing pad
    s_aff: int,
    s_gen: int,
    sub: int,
    s_wide: int = 0,
    wide_k: int = 1,
    wide_groups: tuple = (),
    interpret: bool = False,
):
    """Whole-x-in-VMEM slab SpMV. Returns y as (n_tiles, sub, 128)."""
    n_tiles = (vals_aff if s_aff else
               (vals_gen if s_gen else vals_wide)).shape[0]
    specs = _specs(s_aff, s_gen, s_wide, sub)
    in_specs = _pack(specs, s_aff, s_gen, s_wide) + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ]
    args = _pack((meta_aff, vals_aff, meta_gen, vals_gen, lidx_gen,
                  meta_wide, vals_wide, lidx_wide, dblk_wide),
                 s_aff, s_gen, s_wide) + [x2d]
    return pl.pallas_call(
        functools.partial(_kernel_whole, s_aff=s_aff, s_gen=s_gen,
                          s_wide=s_wide, wide_k=wide_k, sub=sub,
                          wide_groups=wide_groups),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, sub, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, sub, LANES), x2d.dtype),
        interpret=interpret,
    )(*args)


def _kernel_win(*refs, s_aff: int, s_gen: int, s_wide: int, wide_k: int,
                sub: int, w_blocks: int, wide_groups: tuple = ()):
    wchunk_ref = refs[0]
    (meta_a, vals_a, meta_g, vals_g, lidx_g, meta_w, vals_w, lidx_w,
     dblk_w, rest) = _unpack(refs[1:-4], s_aff, s_gen, s_wide)
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
        lambda b, h=sub: xbuf[pl.ds(b, h), :], c * w_blocks,
        meta_a, vals_a, meta_g, vals_g, lidx_g,
        meta_w, vals_w, lidx_w, dblk_w, y_ref,
        s_aff=s_aff, s_gen=s_gen, s_wide=s_wide, wide_k=wide_k, sub=sub,
        wide_groups=wide_groups,
    )


@functools.partial(
    jax.jit,
    static_argnames=("s_aff", "s_gen", "s_wide", "wide_k", "sub",
                     "w_blocks", "wide_groups", "interpret"),
)
def bslab_spmv_win(
    wchunk,     # (n_tiles,) int32 per-tile covering-chunk index
    meta_aff,
    vals_aff,
    meta_gen,
    vals_gen,
    lidx_gen,
    meta_wide,
    vals_wide,
    lidx_wide,
    dblk_wide,
    x2d,        # ((max wchunk + 2) * W, 128): padded x in HBM
    s_aff: int,
    s_gen: int,
    sub: int,
    w_blocks: int,
    s_wide: int = 0,
    wide_k: int = 1,
    wide_groups: tuple = (),
    interpret: bool = False,
):
    """Chunk-resident windowed slab SpMV (win2 design, see module doc)."""
    n_tiles = (vals_aff if s_aff else
               (vals_gen if s_gen else vals_wide)).shape[0]
    specs = _specs(s_aff, s_gen, s_wide, sub)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + _pack(
        specs, s_aff, s_gen, s_wide
    ) + [pl.BlockSpec(memory_space=pltpu.HBM)]
    args = [wchunk] + _pack(
        (meta_aff, vals_aff, meta_gen, vals_gen, lidx_gen,
         meta_wide, vals_wide, lidx_wide, dblk_wide), s_aff, s_gen, s_wide
    ) + [x2d]
    return pl.pallas_call(
        functools.partial(
            _kernel_win, s_aff=s_aff, s_gen=s_gen, s_wide=s_wide,
            wide_k=wide_k, sub=sub, w_blocks=w_blocks,
            wide_groups=wide_groups,
        ),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, sub, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, sub, LANES), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * w_blocks, LANES), x2d.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
