"""Fused Pallas kernel for the matrix-free stencil apply.

The XLA lowering of the tensor-product form (formats/stencil.py
28I - Sz.Sy.Sx) materializes every pad/slice intermediate in HBM —
measured 0.357 ms at 100^3 (22 GB/s vectors-only, ~5 full-array round
trips). This kernel fuses the whole separable apply per z-slab tile in
VMEM, so traffic is one x read + one y write (+ a (tz+2)/tz z-halo
re-read) — the true speed-of-light for the operator.

Padded vector space ("the stencil permutation"): x lives as a 2-D
(n_rows, nxp) array — one row per (z, y) line, nx rounded to the
128-lane tile (one extra zero lane group when nx is an exact multiple,
so lane rolls wrap zeros, never data), ny rounded to the 8-sublane tile
(nyp rows per plane), and one ZERO halo plane before and after the
domain. All padding is zero and every kernel output keeps it zero, so
BLAS-1/dot arithmetic over the padded space is exact — the same contract
row-permuting formats use (solvers/cg.py permuted_output path).

Everything in-kernel is strictly 2-D: Mosaic rejected the whole-window
1-D -> 2-D value reshape ("infer-vector-layout: unsupported shape
cast"), so the window loads as (rows, nxp) and

    Sx = two lane rolls (pad lanes are zero),
    Sy = two sublane rolls masked at plane-boundary rows,
    Sz = three static row slices at plane stride nyp,

with plane-position masks derived from one row iota mod nyp. Manual
DMAs address whole rows; slice offsets are multiples of nyp (8-aligned),
per the dbuf tile-alignment lesson (NOTES.md).
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


def pad_dims(nx: int, ny: int, nz: int) -> Tuple[int, int]:
    """(nxp, nyp): lane/sublane-padded x/y extents. nx an exact lane
    multiple gets one extra zero lane group so cyclic rolls wrap zeros;
    ny an exact sublane-tile multiple likewise gets one extra zero row
    group, so the Sy sublane rolls cross plane boundaries through zeros
    and need NO masks (the masked version measured VPU-bound: the two
    (w_rows, nxp) mask selects cost more than the rolls themselves)."""
    if nx % LANES == 0:
        nxp = nx + LANES
    else:
        nxp = (nx + LANES - 1) // LANES * LANES
    nyp = (ny + SUBLANES - 1) // SUBLANES * SUBLANES
    if nyp == ny:
        nyp += SUBLANES
    return nxp, nyp


def choose_tz(nz: int, plane_bytes: int,
              budget: int = 12 * 1024 * 1024) -> int:
    """Largest divisor of nz whose DOUBLE-BUFFERED footprint — two
    (tz+2)-plane x windows + two tz-plane y buffers + the zero plane,
    (4*tz + 5) planes total — fits ``budget`` (v5e scoped VMEM is
    ~16 MB; headroom for Mosaic spills)."""
    best = 1
    for tz in range(1, nz + 1):
        if nz % tz == 0 and (4 * tz + 5) * plane_bytes <= budget \
                and tz <= 64:
            best = tz
    return best


def _apply_window(v, *, nx: int, ny: int, nxp: int, nyp: int, tz: int,
                  use_7pt: bool):
    """The separable 27/7-pt apply on one (tz+2)-plane window ``v`` (in
    compute dtype). Returns (vc, y_masked): the interior slice of v and
    the masked interior result — shared by the plain apply kernel and
    the fused axpy+apply kernel."""
    dt = v.dtype

    def sum_x(t):  # lane rolls; pad lanes are zero so wraps carry zeros
        return (t + pltpu.roll(t, shift=nxp - 1, axis=1)
                + pltpu.roll(t, shift=1, axis=1))

    def sum_y(t):
        # sublane rolls, UNMASKED: pad_dims guarantees at least one zero
        # pad row between planes, so every real row's cross-plane
        # neighbor read lands on a zero row. Pad rows read real data —
        # garbage confined to pad rows, killed by the output mask.
        return (t + pltpu.roll(t, shift=t.shape[0] - 1, axis=0)
                + pltpu.roll(t, shift=1, axis=0))

    def sum_z(t):  # three static row slices at plane stride
        return (t[0 : tz * nyp] + t[nyp : (tz + 1) * nyp]
                + t[2 * nyp : (tz + 2) * nyp])

    vc = v[nyp : (tz + 1) * nyp]
    if use_7pt:
        s = (sum_x(v)[nyp : (tz + 1) * nyp]
             + sum_y(v)[nyp : (tz + 1) * nyp] + sum_z(v))
        y = jnp.asarray(30.0, dt) * vc - s
    else:
        # Sz FIRST: the three S operators commute exactly (tensor
        # product; truncation factorizes per axis) and every stage
        # preserves the zero pad rows/lanes the later rolls rely on —
        # so Sy and Sx run on the tz-plane interior instead of the
        # (tz+2)-plane window, ~17% less VPU work on the roll stages
        y = jnp.asarray(28.0, dt) * vc - sum_x(sum_y(sum_z(v)))

    # zero the pad rows/lanes (their Sy/Sx sums see real data, but the
    # padded vector space contract is pad == 0 everywhere). pos_c is a
    # FRESH iota, not pos[:tz*nyp]: slicing a lane-broadcast iota crashes
    # Mosaic when nxp spans >1 lane tile (vector_extract_slice_impl
    # "limits[i] <= dim(i) (2 vs. 1)", observed at nxp=256 on v5e)
    row_c = jax.lax.broadcasted_iota(jnp.int32, (tz * nyp, nxp), 0)
    pos_c = row_c - (row_c // nyp) * nyp
    lane = jax.lax.broadcasted_iota(jnp.int32, (tz * nyp, nxp), 1)
    y_masked = jnp.where(
        (pos_c < ny) & (lane < nx), y, jnp.asarray(0, dt)
    )
    return vc, y_masked


def _stencil_kernel(
    x_hbm, *rest,
    nx: int, ny: int, nz: int, nxp: int, nyp: int, tz: int, use_7pt: bool,
    with_dots: bool = False,
):
    if with_dots:
        (y_hbm, dots_ref, xwin, ywin, zplane, sem_in, sem_out,
         sem_z) = rest
    else:
        y_hbm, xwin, ywin, zplane, sem_in, sem_out, sem_z = rest
    a = pl.program_id(0)
    n_tiles = nz // tz
    w_rows = (tz + 2) * nyp
    # slot strides rounded to 16 rows so bf16 (16,128) tiling stays
    # slice-aligned (the dia dbuf scratch-alignment lesson)
    xstride = (w_rows + 15) & ~15
    ystride = (tz * nyp + 15) & ~15

    # DOUBLE-BUFFERED pipeline (r4): the r3 kernel serialized
    # DMA-in -> compute -> DMA-out per tile and measured 246 GB/s
    # vectors-only at 200^3 (2.7x off roofline, exactly the
    # serialization factor); tile a+1's input DMA and tile a-1's output
    # DMA now overlap tile a's compute (guide 'Double Buffering'; the
    # TPU grid is sequential so 2-slot scratch carries across steps).
    def in_dma(slot, idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(idx * tz * nyp, w_rows), :],
            xwin.at[pl.ds(slot * xstride, w_rows), :],
            sem_in.at[slot],
        )

    def out_dma(slot, idx):
        return pltpu.make_async_copy(
            ywin.at[pl.ds(slot * ystride, tz * nyp), :],
            y_hbm.at[pl.ds((1 + idx * tz) * nyp, tz * nyp), :],
            sem_out.at[slot],
        )

    @pl.when(a == 0)
    def _():
        in_dma(0, 0).start()

    @pl.when(a + 1 < n_tiles)
    def _():
        in_dma((a + 1) % 2, a + 1).start()

    in_dma(a % 2, a).wait()

    v = xwin[pl.ds((a % 2) * xstride, w_rows), :]
    store_dt = v.dtype
    # Mosaic has no sub-32-bit rotate ("tpu.dynamic_rotate ... not
    # implemented: Rotate with non-32-bit data", v5e, observed with bf16
    # under --refine): upcast IN-REGISTER after the DMA — the HBM reads,
    # VMEM window, and output store all stay bf16, so the bandwidth win
    # is untouched; only the VPU roll/add stages widen (same discipline
    # as the DIA kernels' bf16-x-as-f32 fix, formats/dia.py).
    if store_dt.itemsize < 4:
        v = v.astype(jnp.float32)
    vc, y_masked = _apply_window(v, nx=nx, ny=ny, nxp=nxp, nyp=nyp, tz=tz,
                                 use_7pt=use_7pt)
    # the ywin slot frees once ITS previous output DMA (tile a-2) lands
    @pl.when(a >= 2)
    def _():
        out_dma(a % 2, a - 2).wait()

    ywin[pl.ds((a % 2) * ystride, tz * nyp), :] = y_masked.astype(store_dt)
    if with_dots:
        # free CG dot products: the kernel already holds u (the spmv
        # input, interior slice vc) and w = A u (y_masked); the padded
        # space's zero-pad invariant makes the full-tile sums exact.
        # gamma = u.u, delta = w.u (solvers/cg.py cg_cs_loop).
        acc = jnp.float32
        dots_ref[a, 0] = jnp.sum(vc.astype(acc) * vc.astype(acc))
        dots_ref[a, 1] = jnp.sum(y_masked.astype(acc) * vc.astype(acc))

    out_dma(a % 2, a).start()

    # drain both in-flight output DMAs at the last tile
    last = n_tiles - 1

    @pl.when(a == last)
    def _():
        out_dma(last % 2, last).wait()

    if n_tiles > 1:
        @pl.when(a == last)
        def _():
            out_dma((last - 1) % 2, last - 1).wait()

    # the two output halo planes belong to no tile: edge tiles zero them
    @pl.when(a == 0)
    def _():
        zplane[:, :] = jnp.zeros((nyp, nxp), store_dt)
        cp = pltpu.make_async_copy(
            zplane, y_hbm.at[pl.ds(0, nyp), :], sem_z
        )
        cp.start()
        cp.wait()

    @pl.when(a == n_tiles - 1)
    def _():
        zplane[:, :] = jnp.zeros((nyp, nxp), store_dt)
        cp = pltpu.make_async_copy(
            zplane, y_hbm.at[pl.ds((1 + nz) * nyp, nyp), :], sem_z
        )
        cp.start()
        cp.wait()


def _apply_call(xpad, nx, ny, nz, use_7pt, tz, interpret, with_dots):
    nxp, nyp = pad_dims(nx, ny, nz)
    plane = nyp * nxp
    assert xpad.shape[0] == (nz + 2) * plane, (xpad.shape, nz, plane)
    # budget the tile by the COMPUTE width, not the stored width: sub-
    # 32-bit windows upcast to f32 in-register (Mosaic has no bf16
    # rotate — _stencil_kernel), so the scoped-VMEM footprint is the f32
    # one. Budgeting with itemsize=2 at 200^3 picked tz=25 and blew the
    # 16 MB scoped limit by 564 KB on the chip (bf16 --refine, r3).
    tz = tz or choose_tz(nz, plane * max(xpad.dtype.itemsize, 4))
    grid = nz // tz
    kernel = functools.partial(
        _stencil_kernel, nx=nx, ny=ny, nz=nz, nxp=nxp, nyp=nyp, tz=tz,
        use_7pt=use_7pt, with_dots=with_dots,
    )
    # the 2-D (rows, nxp) view is reshaped OUTSIDE the kernel; the kernel
    # only ever row-slices it (no raw element math on a 2-D operand —
    # the bslab layout lesson, NOTES.md)
    x2d = xpad.reshape(-1, nxp)
    out_specs = pl.BlockSpec(memory_space=pltpu.HBM)
    out_shape = jax.ShapeDtypeStruct(x2d.shape, x2d.dtype)
    if with_dots:
        # whole-array SMEM output (Mosaic rejects partial SMEM blocks:
        # "last two dimensions ... divisible by 8 and 128 or equal");
        # each tile scalar-stores its own row
        out_specs = [
            out_specs,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((grid, 2), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            # 2-slot double buffers (16-row-aligned slot strides)
            pltpu.VMEM((2 * (((tz + 2) * nyp + 15) & ~15), nxp),
                       xpad.dtype),
            pltpu.VMEM((2 * ((tz * nyp + 15) & ~15), nxp), xpad.dtype),
            pltpu.VMEM((nyp, nxp), xpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2d)


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "nz", "use_7pt", "tz", "interpret"),
)
def stencil_apply_pallas(
    xpad: jnp.ndarray,   # flat (nz+2)*nyp*nxp padded vector space
    nx: int, ny: int, nz: int,
    use_7pt: bool = False,
    tz: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    y2d = _apply_call(xpad, nx, ny, nz, use_7pt, tz, interpret, False)
    return y2d.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "nz", "use_7pt", "tz", "interpret"),
)
def stencil_apply_dots_pallas(
    xpad: jnp.ndarray,
    nx: int, ny: int, nz: int,
    use_7pt: bool = False,
    tz: int = 0,
    interpret: bool = False,
):
    """(w, [gamma, delta]) where w = A @ xpad, gamma = xpad.xpad and
    delta = w.xpad over the interior (pads are zero by the vector-space
    contract) — the two dot products of single-reduction CG for free
    inside the apply (solvers/cg.py cg_cs_loop)."""
    y2d, parts = _apply_call(xpad, nx, ny, nz, use_7pt, tz, interpret,
                             True)
    return y2d.reshape(-1), jnp.sum(parts, axis=0)


# --------------------------------------------------------------------------
# Fused CG "stage A": p = r + beta*p, w = A p, delta-partials = p.w — the
# three memory passes of standard CG's front half in ONE kernel.
# --------------------------------------------------------------------------


def choose_tz_axpy(nz: int, plane_bytes: int,
                   budget: int = 12 * 1024 * 1024) -> int:
    """Largest divisor of nz whose fused-kernel footprint — two
    double-buffered (tz+2)-plane input windows (r, p) + two SINGLE-slot
    tz-plane output buffers (p_new, w; a ~3 us out-DMA always lands
    within the next tile's ~10 us in-wait + compute, so the second slot
    bought nothing while halving tz) + the zero plane, (6*tz + 9) planes
    — fits ``budget``. tz=8 instead of 5 at 200^3: fewer, larger DMAs
    (measured stage A 0.48 ms at tz=5 vs the 0.27 ms traffic bound —
    per-DMA issue cost dominates at small tiles)."""
    best = 1
    for tz in range(1, nz + 1):
        if nz % tz == 0 and (6 * tz + 9) * plane_bytes <= budget \
                and tz <= 64:
            best = tz
    return best


def _axpy_apply_kernel(
    r_hbm, p_hbm, beta_ref, pn_hbm, w_hbm, dots_ref,
    rwin, pwin, pnbuf, wbuf, zplane,
    sem_r, sem_p, sem_pn, sem_w, sem_z, *,
    nx: int, ny: int, nz: int, nxp: int, nyp: int, tz: int, use_7pt: bool,
):
    """Per tile: DMA the r and p windows, form p_new = r + beta*p
    IN-REGISTER (the window's halo planes are recomputed locally — free
    compute instead of an extra stream), apply the stencil to p_new,
    store the p_new interior + w tiles, and emit the delta = p_new.w
    partial. Everything double-buffered like _stencil_kernel.

    CG's stage B (x += alpha p, r -= alpha w, rtrans = r.r) stays in XLA
    — it fuses to one elementwise+reduction pass on its own (the r3
    all-axpy Pallas kernel measured SLOWER than XLA's fusion, NOTES r3;
    only the stage-A fusion has traffic XLA cannot eliminate, because
    the apply is an opaque custom call to it)."""
    a = pl.program_id(0)
    n_tiles = nz // tz
    w_rows = (tz + 2) * nyp
    xstride = (w_rows + 15) & ~15
    ystride = (tz * nyp + 15) & ~15

    def in_dma(buf, hbm, sem, slot, idx):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(idx * tz * nyp, w_rows), :],
            buf.at[pl.ds(slot * xstride, w_rows), :],
            sem.at[slot],
        )

    def out_dma(buf, hbm, sem, slot, idx):
        return pltpu.make_async_copy(
            buf.at[pl.ds(slot * ystride, tz * nyp), :],
            hbm.at[pl.ds((1 + idx * tz) * nyp, tz * nyp), :],
            sem.at[slot],
        )

    @pl.when(a == 0)
    def _():
        in_dma(rwin, r_hbm, sem_r, 0, 0).start()
        in_dma(pwin, p_hbm, sem_p, 0, 0).start()

    @pl.when(a + 1 < n_tiles)
    def _():
        in_dma(rwin, r_hbm, sem_r, (a + 1) % 2, a + 1).start()
        in_dma(pwin, p_hbm, sem_p, (a + 1) % 2, a + 1).start()

    in_dma(rwin, r_hbm, sem_r, a % 2, a).wait()
    in_dma(pwin, p_hbm, sem_p, a % 2, a).wait()

    rv = rwin[pl.ds((a % 2) * xstride, w_rows), :]
    pv = pwin[pl.ds((a % 2) * xstride, w_rows), :]
    store_dt = rv.dtype
    if store_dt.itemsize < 4:  # see _stencil_kernel: no sub-32-bit rotate
        rv = rv.astype(jnp.float32)
        pv = pv.astype(jnp.float32)
    beta = beta_ref[0].astype(rv.dtype)
    pn = rv + beta * pv  # pads stay zero: r and p pads are zero
    pnc, y_masked = _apply_window(pn, nx=nx, ny=ny, nxp=nxp, nyp=nyp,
                                  tz=tz, use_7pt=use_7pt)

    @pl.when(a >= 1)
    def _():
        out_dma(pnbuf, pn_hbm, sem_pn, 0, a - 1).wait()
        out_dma(wbuf, w_hbm, sem_w, 0, a - 1).wait()

    pnbuf[pl.ds(0, tz * nyp), :] = pnc.astype(store_dt)
    wbuf[pl.ds(0, tz * nyp), :] = y_masked.astype(store_dt)
    # delta partial at the vectors' compute width: an f32 partial under
    # f64 vectors shifted alpha by ~1e-7 relative and broke iterate
    # parity with standard CG (CPU f64 parity tests)
    acc = dots_ref.dtype
    dots_ref[a, 0] = jnp.sum(y_masked.astype(acc) * pnc.astype(acc))
    out_dma(pnbuf, pn_hbm, sem_pn, 0, a).start()
    out_dma(wbuf, w_hbm, sem_w, 0, a).start()

    last = n_tiles - 1

    @pl.when(a == last)
    def _():
        out_dma(pnbuf, pn_hbm, sem_pn, 0, last).wait()
        out_dma(wbuf, w_hbm, sem_w, 0, last).wait()

    # zero the output halo planes of BOTH outputs (fresh buffers; the
    # padded-space contract is pad == 0 — p_new feeds the next apply)
    @pl.when(a == 0)
    def _():
        zplane[:, :] = jnp.zeros((nyp, nxp), store_dt)
        for hbm, sem in ((pn_hbm, sem_z), (w_hbm, sem_z)):
            cp = pltpu.make_async_copy(
                zplane, hbm.at[pl.ds(0, nyp), :], sem
            )
            cp.start()
            cp.wait()

    @pl.when(a == n_tiles - 1)
    def _():
        zplane[:, :] = jnp.zeros((nyp, nxp), store_dt)
        for hbm, sem in ((pn_hbm, sem_z), (w_hbm, sem_z)):
            cp = pltpu.make_async_copy(
                zplane, hbm.at[pl.ds((1 + nz) * nyp, nyp), :], sem
            )
            cp.start()
            cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "nz", "use_7pt", "tz", "interpret"),
)
def stencil_axpy_apply_dots_pallas(
    rpad: jnp.ndarray,   # flat (nz+2)*nyp*nxp padded residual
    ppad: jnp.ndarray,   # flat padded search direction
    beta: jnp.ndarray,   # scalar
    nx: int, ny: int, nz: int,
    use_7pt: bool = False,
    tz: int = 0,
    interpret: bool = False,
):
    """(p_new, w, delta): p_new = rpad + beta*ppad, w = A p_new,
    delta = p_new.w — CG stage A in one fused pass (cg_fused_loop)."""
    nxp, nyp = pad_dims(nx, ny, nz)
    plane = nyp * nxp
    assert rpad.shape == ppad.shape and rpad.shape[0] == (nz + 2) * plane
    tz = tz or choose_tz_axpy(nz, plane * max(rpad.dtype.itemsize, 4))
    grid = nz // tz
    kernel = functools.partial(
        _axpy_apply_kernel, nx=nx, ny=ny, nz=nz, nxp=nxp, nyp=nyp, tz=tz,
        use_7pt=use_7pt,
    )
    r2d = rpad.reshape(-1, nxp)
    p2d = ppad.reshape(-1, nxp)
    # beta at the vectors' compute width: f64 vectors (CPU parity runs)
    # must not round beta through f32 — it changes iterates above the
    # history-parity tolerance; sub-32-bit vectors compute in f32
    beta_dt = jnp.float64 if r2d.dtype == jnp.float64 else jnp.float32
    beta1 = jnp.asarray(beta, beta_dt).reshape(1)
    xs = ((tz + 2) * nyp + 15) & ~15
    ys = (tz * nyp + 15) & ~15
    pn2d, w2d, parts = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(r2d.shape, r2d.dtype),
            jax.ShapeDtypeStruct(r2d.shape, r2d.dtype),
            jax.ShapeDtypeStruct((grid, 1), beta_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * xs, nxp), r2d.dtype),
            pltpu.VMEM((2 * xs, nxp), r2d.dtype),
            pltpu.VMEM((ys, nxp), r2d.dtype),
            pltpu.VMEM((ys, nxp), r2d.dtype),
            pltpu.VMEM((nyp, nxp), r2d.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(r2d, p2d, beta1)
    return pn2d.reshape(-1), w2d.reshape(-1), jnp.sum(parts)
