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
              budget: int = 4 * 1024 * 1024) -> int:
    """Largest divisor of nz with a (tz+2)-plane window under ``budget``."""
    best = 1
    for tz in range(1, nz + 1):
        if nz % tz == 0 and (tz + 2) * plane_bytes <= budget and tz <= 64:
            best = tz
    return best


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

    cp_in = pltpu.make_async_copy(
        x_hbm.at[pl.ds(a * tz * nyp, w_rows), :], xwin, sem_in
    )
    cp_in.start()
    cp_in.wait()

    v = xwin[:, :]
    store_dt = v.dtype
    # Mosaic has no sub-32-bit rotate ("tpu.dynamic_rotate ... not
    # implemented: Rotate with non-32-bit data", v5e, observed with bf16
    # under --refine): upcast IN-REGISTER after the DMA — the HBM reads,
    # VMEM window, and output store all stay bf16, so the bandwidth win
    # is untouched; only the VPU roll/add stages widen (same discipline
    # as the DIA kernels' bf16-x-as-f32 fix, formats/dia.py).
    if store_dt.itemsize < 4:
        v = v.astype(jnp.float32)
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
    ywin[:, :] = y_masked.astype(store_dt)
    if with_dots:
        # free CG dot products: the kernel already holds u (the spmv
        # input, interior slice vc) and w = A u (y_masked); the padded
        # space's zero-pad invariant makes the full-tile sums exact.
        # gamma = u.u, delta = w.u (solvers/cg.py cg_cs_loop).
        acc = jnp.float32
        dots_ref[a, 0] = jnp.sum(vc.astype(acc) * vc.astype(acc))
        dots_ref[a, 1] = jnp.sum(y_masked.astype(acc) * vc.astype(acc))

    cp_out = pltpu.make_async_copy(
        ywin, y_hbm.at[pl.ds((1 + a * tz) * nyp, tz * nyp), :], sem_out
    )
    cp_out.start()
    cp_out.wait()

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
            pltpu.VMEM(((tz + 2) * nyp, nxp), xpad.dtype),
            pltpu.VMEM((tz * nyp, nxp), xpad.dtype),
            pltpu.VMEM((nyp, nxp), xpad.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
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
