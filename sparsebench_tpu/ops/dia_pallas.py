"""Pallas TPU kernel for DIA (diagonal-format) SpMV.

The XLA-level DIA SpMV (formats/dia.py) re-reads the shifted x vector from
HBM once per diagonal (~27x for the stencil problems). This kernel tiles
rows and keeps the x window VMEM-resident, so per tile:

    traffic = diag data (streamed once) + x window (once) + y (once)

which is the speed-of-light byte count for the operator. All shifted x
accesses decompose into a static sublane slice (shift // 128) plus a lane
roll (shift % 128) with a cross-row carry select — pure VPU register moves,
no gathers (XLA's gather lowering measured ~1 GB/s on v5e; shifts run at
full vector throughput).

Pipelining: the diagonal data and y tiles are pallas-blocked (automatic
HBM<->VMEM double buffering); the overlapping x window (stride = tile,
size = tile + span) cannot be expressed as a BlockSpec, so it is DMA'd
manually from an unblocked HBM ref into VMEM scratch each grid step.

The x operand is deliberately **1-D**. A 2-D (N, 128) operand was observed
to receive a different (tiled) layout when the kernel ran inside
lax.while_loop / fori_loop bodies, silently breaking the manual DMA's raw
index math (41% of outputs garbage); a 1-D array has a unique layout in
every context. The kernel reshapes the loaded window to (rows+span, 128)
as a value, which is free for a contiguous buffer.

Layout contract (built by formats/dia.py when the Pallas path is enabled):
    data3d : (ndiag, nr_pad/128, 128)  diag values, zero padded
    x1d    : (lead + nr_pad + trail,)  flat x, zero padded
    y      : (nr_pad/128, 128)

The kernel is specialized per (offsets, tile) at trace time; offsets are
static Python ints, so the diagonal loop fully unrolls.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TILE_ROWS = 256


def _shifted_window(xw2, q: int, r: int, rows: int, variant: str = "roll1"):
    """(rows, 128) view of the VMEM x window shifted by q*128 + r:
    out[j, l] = xwin_flat[(q + j)*128 + l + r].

    variant "roll1": roll the (rows+1)-row slice once; the unrolled part
    (lanes < 128-r) comes from its first ``rows`` rows, the carried part
    from the one-row-shifted slice. variant "roll2": roll the two row
    slices separately (two rolls, no post-roll row slices).
    """
    if r == 0:
        return xw2[q : q + rows, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    # roll left by r == roll right by 128 - r (pltpu.roll wants shift >= 0)
    if variant == "roll1":
        rolled = pltpu.roll(xw2[q : q + rows + 1, :], shift=LANES - r, axis=1)
        return jnp.where(
            lane < LANES - r, rolled[:rows, :], rolled[1 : rows + 1, :]
        )
    ra = pltpu.roll(xw2[q : q + rows, :], shift=LANES - r, axis=1)
    rb = pltpu.roll(xw2[q + 1 : q + 1 + rows, :], shift=LANES - r, axis=1)
    return jnp.where(lane < LANES - r, ra, rb)


def _accumulate(xw2, data_ref, y_ref, shifts, rows, roll):
    """Shared accumulation: y = sum_d data[d] * shift(x, s_d)."""
    out_dtype = y_ref.dtype
    acc = None
    for d, s in enumerate(shifts):
        q, r = divmod(s, LANES)
        xs = _shifted_window(xw2, q, r, rows, roll)
        # diag data may be stored compressed (bf16); accumulate in x dtype
        term = data_ref[d].astype(out_dtype) * xs
        acc = term if acc is None else acc + term
    y_ref[:, :] = acc


def _dia_kernel(
    x_hbm, data_ref, y_ref, xwin, sem, *, shifts: Tuple[int, ...],
    rows: int, span: int, variant: str = "roll1",
):
    i = pl.program_id(0)
    # fetch the overlapping x window for this tile:
    # elements [i*rows*128, (i*rows + rows + span)*128)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * rows * LANES, (rows + span) * LANES)], xwin, sem
    )
    cp.start()
    cp.wait()
    xw2 = xwin[:].reshape(rows + span, LANES)  # free: contiguous buffer
    _accumulate(xw2, data_ref, y_ref, shifts, rows, variant)


def _dia_kernel_dbuf(
    x_hbm, data_ref, y_ref, xwin, sem, *, shifts: Tuple[int, ...],
    rows: int, span: int, grid_n: int, roll: str = "roll1",
):
    """Double-buffered x window: tile i+1's window DMA overlaps tile i's
    compute (guide 'Patterns: Double Buffering'; the grid is sequential on
    TPU so the 2-slot scratch carries across grid steps). The scratch is
    a FLAT (2*win,) buffer sliced at element offsets — a (2, win) scratch
    gets (2,128) tiling on dim 0 and slicing one slot then violates tile
    alignment ("Slice shape along dimension 0 must be aligned to tiling
    (2), but is 1"); win is a multiple of 1024 so flat slices stay
    tile-aligned."""
    i = pl.program_id(0)
    win = (rows + span) * LANES

    def dma(slot, idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(idx * rows * LANES, win)],
            xwin.at[pl.ds(slot * win, win)],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < grid_n)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    xw2 = xwin[pl.ds((i % 2) * win, win)].reshape(rows + span, LANES)
    _accumulate(xw2, data_ref, y_ref, shifts, rows, roll)


def _dia_kernel_win(
    x_hbm, data_ref, y_ref, xwin, sem, prev_ref, *,
    shifts: Tuple[int, ...], rows: int, span: int, tiles_per_chunk: int,
    roll: str = "roll1",
):
    """Chunk-resident x window (the bslab win2 scheme, ops/bslab_pallas.py
    _kernel_win): ONE (chunk + span)-row x DMA serves ``tiles_per_chunk``
    consecutive row tiles, so the x overlap traffic is amortized from
    (rows+span)/rows per tile (3.5x at 200^3, span=632) down to
    (chunk+span)/chunk (~1.15x) — the dbuf kernel's sliding window
    re-reads dominate its 2x-off-roofline gap (benchmarks/dia_micro.py:
    with x resident every roll variant is memory-bound at 700+ GB/s).
    x_hbm is (x_rows, 128); the scratch window is 2-D so all addressing
    is row-sliced (no raw element math — the bslab layout lesson)."""
    i = pl.program_id(0)
    c = i // tiles_per_chunk
    win_rows = tiles_per_chunk * rows + span + 8  # matches the scratch

    @pl.when(jnp.logical_or(i == 0, c != prev_ref[0]))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * tiles_per_chunk * rows, win_rows), :],
            xwin, sem,
        )
        cp.start()
        cp.wait()

    prev_ref[0] = c
    off = (i - c * tiles_per_chunk) * rows
    out_dtype = y_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    acc = None

    def add(d, xs):
        nonlocal acc
        term = data_ref[d].astype(out_dtype) * xs
        acc = term if acc is None else acc + term

    if roll in ("carry", "gcarry"):
        # carry row via a cheap sublane roll by -1 instead of a second
        # sublane-misaligned value slice (benchmarks/dia_micro.py);
        # "gcarry" additionally hoists the window slice per distinct q
        # (the 27-pt stencil has 9-10 q-groups of ~3 diagonals)
        plan = sorted(
            (s // LANES, s % LANES, d) for d, s in enumerate(shifts)
        )
        groups: dict = {}
        for q, r, d in plan:
            groups.setdefault(q, []).append((r, d))
        for q, group in groups.items():
            w = None
            if roll == "gcarry":
                w = xwin[pl.ds(off + q, rows + 8), :]
            for r, d in group:
                wv = w if w is not None else xwin[pl.ds(off + q, rows + 8), :]
                if r == 0:
                    add(d, wv[:rows])
                    continue
                rolled = pltpu.roll(wv, shift=LANES - r, axis=1)
                carry = pltpu.roll(rolled, shift=rolled.shape[0] - 1, axis=0)
                add(d, jnp.where(lane < LANES - r, rolled[:rows],
                                 carry[:rows]))
    else:
        for d, s in enumerate(shifts):
            q, r = divmod(s, LANES)
            if r == 0:
                add(d, xwin[pl.ds(off + q, rows), :])
                continue
            rolled = pltpu.roll(
                xwin[pl.ds(off + q, rows + 1), :], shift=LANES - r, axis=1
            )
            add(d, jnp.where(lane < LANES - r, rolled[:rows, :],
                             rolled[1 : rows + 1, :]))
    y_ref[:, :] = acc


def _dia_kernel_mrhs(
    x_hbm, data_ref, y_ref, xwin, sem, *, shifts: Tuple[int, ...],
    rows: int, span: int, x_len: int, roll: str = "roll1",
):
    """Multi-RHS kernel: grid (tiles, k) with the COLUMN index innermost.
    The diagonal-data block's index map is constant in the column index,
    so pallas skips its re-fetch on consecutive steps — the matrix is
    read from HBM once per row tile for all k right-hand sides (the
    whole point of the blocked solve, solvers/cg_multi.py). Each
    (tile, column) step DMAs that column's x window; x_hbm is the k
    padded columns flattened 1-D (the module's layout lesson: 1-D HBM
    operands keep a unique layout in every calling context)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c * x_len + i * rows * LANES, (rows + span) * LANES)],
        xwin, sem,
    )
    cp.start()
    cp.wait()
    xw2 = xwin[:].reshape(rows + span, LANES)
    out_dtype = y_ref.dtype
    acc = None
    for d, s in enumerate(shifts):
        q, r = divmod(s, LANES)
        xs = _shifted_window(xw2, q, r, rows, roll)
        term = data_ref[d].astype(out_dtype) * xs
        acc = term if acc is None else acc + term
    y_ref[0, :, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "nr_pad", "tile_rows", "interpret", "variant"),
)
def dia_spmm_pallas(
    data3d: jnp.ndarray,      # (ndiag, nr_pad/128, 128)
    x2d: jnp.ndarray,         # (k, >= lead + nr) padded columns
    offsets: Tuple[int, ...],
    nr_pad: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
    variant: str = "roll1",
) -> jnp.ndarray:
    """Multi-RHS DIA SpMV: returns (k, grid-padded rows, 128); rows beyond
    nr are zero because the padded diagonal data is zero. See
    _dia_kernel_mrhs for the traffic model."""
    ndiag = data3d.shape[0]
    k = x2d.shape[0]
    n_rows = nr_pad // LANES
    lead = x_lead_pad(offsets)
    shifts = tuple(int(o) + lead for o in offsets)
    span = _span_rows(shifts)
    grid = (n_rows + tile_rows - 1) // tile_rows
    grid_rows = grid * tile_rows
    if grid_rows != data3d.shape[1]:
        data3d = jnp.pad(
            data3d, ((0, 0), (0, grid_rows - data3d.shape[1]), (0, 0))
        )
    need_x = (grid_rows + span) * LANES
    if x2d.shape[1] < need_x:
        x2d = jnp.pad(x2d, ((0, 0), (0, need_x - x2d.shape[1])))
    x_len = x2d.shape[1]
    roll = "roll2" if variant.endswith("roll2") else "roll1"
    kernel = functools.partial(
        _dia_kernel_mrhs, shifts=shifts, rows=tile_rows, span=span,
        x_len=x_len, roll=roll,
    )
    call = pl.pallas_call(
        kernel,
        grid=(grid, k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (ndiag, tile_rows, LANES), lambda i, c: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, LANES), lambda i, c: (c, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((k, grid_rows, LANES), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM(((tile_rows + span) * LANES,), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    y = call(x2d.reshape(-1), data3d)
    return y[:, :n_rows]


def _dia_kernel_xres(
    x_ref, data_ref, y_ref, *, shifts: Tuple[int, ...],
    rows: int, span: int, roll: str = "roll1",
):
    """VMEM-resident x: the whole padded x is one blocked VMEM operand with
    a constant index map (pallas fetches it once — consecutive equal block
    indices skip the copy), so there is no per-tile HBM DMA at all. One
    dynamic VMEM slice materializes this tile's window, then the static
    shift code runs unchanged. Only usable when x fits the VMEM budget."""
    i = pl.program_id(0)
    xw = x_ref[pl.ds(i * rows * LANES, (rows + span) * LANES)]
    xw2 = xw.reshape(rows + span, LANES)
    _accumulate(xw2, data_ref, y_ref, shifts, rows, roll)


DEFAULT_TILES_PER_CHUNK = 16


def _conservative_vmem() -> bool:
    """True on backends whose VMEM capacity we have not measured: only
    the v5/v6 generations are known to carry the 128 MB VMEM that the
    raised xres budget and vmem_limit_bytes assume (measured on the dev
    v5e — see VMEM_BUDGET_BYTES); v2-v4 parts have ~16 MB."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # noqa: BLE001 — no backend: stay safe
        return True
    return not ("v5" in kind or "v6" in kind)


def _build_call(ndiag, n_rows, shifts, tile_rows, span, dtype, interpret,
                variant="roll1", x_len=0):
    # ``dtype`` is the x/output dtype; the data operand keeps its own
    # (possibly compressed) dtype. ``variant``: "roll1"/"roll2" pick the
    # lane-roll scheme on the single-buffered DMA kernel; "dbuf[_roll2]"
    # double-buffers the x-window DMA; "xres[_roll2]" holds the whole x
    # VMEM-resident (requires x_len, the padded x length in elements).
    grid = (n_rows + tile_rows - 1) // tile_rows
    roll = "roll2" if variant.endswith("roll2") else "roll1"
    data_spec = pl.BlockSpec(
        (ndiag, tile_rows, LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((grid * tile_rows, LANES), dtype)
    if variant.startswith("xres"):
        kernel = functools.partial(
            _dia_kernel_xres, shifts=shifts, rows=tile_rows, span=span,
            roll=roll,
        )
        # the whole-x VMEM operand exceeds Mosaic's default 16 MB scoped
        # vmem allowance beyond ~100^3; the v5e has 128 MB VMEM and the
        # raised limit measured at full HBM rate up to 67 MB of x (r3).
        # Unmeasured generations keep the default allowance (their auto
        # budget never selects an oversized xres — _conservative_vmem).
        params = {}
        if not interpret and not _conservative_vmem():
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024,
            )
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                # whole-x VMEM block, constant index map: fetched once
                pl.BlockSpec((x_len,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                data_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
            **params,
        )
    if variant.startswith("win"):
        if variant not in ("win", "win_carry", "win_gcarry"):
            raise ValueError(
                f"unknown win variant {variant!r}; available: win, "
                "win_carry, win_gcarry (the win kernel has no roll2 "
                "scheme — an unknown suffix must not silently run roll1)"
            )
        tpc = DEFAULT_TILES_PER_CHUNK
        # +8 rows: the carry/gcarry schemes slice (rows + 8)-row windows
        win_rows = tpc * tile_rows + span + 8
        if variant.endswith("carry"):
            roll = "gcarry" if variant.endswith("gcarry") else "carry"
        kernel = functools.partial(
            _dia_kernel_win, shifts=shifts, rows=tile_rows, span=span,
            tiles_per_chunk=tpc, roll=roll,
        )
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                # (x_rows, 128) unblocked HBM; all addressing row-sliced
                pl.BlockSpec(memory_space=pltpu.HBM),
                data_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((win_rows, LANES), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((1,), jnp.int32),
            ],
            interpret=interpret,
        )
    if variant.startswith("dbuf"):
        kernel = functools.partial(
            _dia_kernel_dbuf, shifts=shifts, rows=tile_rows, span=span,
            grid_n=grid, roll=roll,
        )
        scratch = [
            pltpu.VMEM((2 * (tile_rows + span) * LANES,), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(
            _dia_kernel, shifts=shifts, rows=tile_rows, span=span,
            variant=roll,
        )
        scratch = [
            pltpu.VMEM(((tile_rows + span) * LANES,), dtype),  # x dtype
            pltpu.SemaphoreType.DMA,
        ]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            # 1-D, unblocked, HBM: unique layout in every calling context
            pl.BlockSpec(memory_space=pltpu.HBM),
            data_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "nr_pad", "tile_rows", "interpret", "variant"),
)
def dia_spmv_pallas(
    data3d: jnp.ndarray,      # (ndiag, nr_pad/128, 128)
    x1d: jnp.ndarray,         # (lead + nr_pad + trail,)
    offsets: Tuple[int, ...],
    nr_pad: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
    variant: str = "roll1",
) -> jnp.ndarray:
    """Returns y2d (grid-padded rows, 128); rows beyond nr are zero because
    the padded diagonal data is zero."""
    ndiag = data3d.shape[0]
    n_rows = nr_pad // LANES
    lead = x_lead_pad(offsets)
    shifts = tuple(int(o) + lead for o in offsets)
    span = _span_rows(shifts)
    # pad data3d rows up to the grid multiple
    grid_rows = ((n_rows + tile_rows - 1) // tile_rows) * tile_rows
    if grid_rows != data3d.shape[1]:
        data3d = jnp.pad(data3d, ((0, 0), (0, grid_rows - data3d.shape[1]), (0, 0)))
    if variant.startswith("win"):
        # the last chunk's window DMA reads a full (tpc*tile + span) rows;
        # pad x (zeros, read once per chunk) rather than the data grid
        chunk = DEFAULT_TILES_PER_CHUNK * tile_rows
        n_chunks = (grid_rows + chunk - 1) // chunk
        need_x = (n_chunks * chunk + span + 8) * LANES
    else:
        need_x = (grid_rows + span) * LANES
    if x1d.shape[0] < need_x:
        x1d = jnp.pad(x1d, (0, need_x - x1d.shape[0]))
    call = _build_call(
        ndiag, n_rows, shifts, tile_rows, span, x1d.dtype, interpret, variant,
        x_len=x1d.shape[0],
    )
    x_arg = x1d.reshape(-1, LANES) if variant.startswith("win") else x1d
    y = call(x_arg, data3d)
    return y[:n_rows]


VMEM_BUDGET_BYTES = 72 * 1024 * 1024  # the dev chip (v5e) has 128 MB
# VMEM, not the generic "~16 MB" older-part figure: measured r3
# (benchmarks/dia_micro.py), a 33.9 MB whole-x VMEM operand at 200^3
# streams at ~845 GB/s and a 67.4 MB one at grid=512 still compiles and
# runs at ~743 GB/s (with the raised per-kernel vmem_limit_bytes). Since
# 2 x 67 MB would exceed physical VMEM, Mosaic provably single-buffers
# the constant-index-map x operand (resolves the ADVICE r2 multi-buffer
# concern empirically), so x is counted ONCE.

XRES_BUDGET_BYTES = 24 * 1024 * 1024  # auto's xres cutoff: r3 sweeps
# (benchmarks/dia_variant_sweep.py, data pre-padded so no per-call copy)
# measured per-SpMV at 100^3 xres 0.048 ms vs dbuf 0.059; at 200^3
# (x = 32.6 MB) xres 0.76 ms vs dbuf 0.61 — pinning a huge x costs more
# than dbuf's fully-overlapped window DMA once x is tens of MB, so auto
# keeps xres only while x stays comfortably small.


def choose_schedule(offsets, nr_pad: int, x_bytes: int, data_bytes: int,
                    variant: str = "auto", tile_rows: int = 0):
    """Resolve (variant, tile_rows) for the DIA kernel. "auto" holds the
    whole padded x VMEM-resident ("xres") while x plus the double-
    buffered data/y blocks fit XRES_BUDGET_BYTES — no per-tile x DMA at
    all — and otherwise uses the sliding double-buffered window
    ("dbuf"), which measured at HBM roofline at 200^3. NOTE r3: the
    historical 200^3 "2x-off-roofline" gap was NOT the kernel — it was
    dia_spmv_pallas's per-call jnp.pad of the whole data operand when
    nr_pad's row count wasn't tile-divisible (fixed by _grid_pad in
    formats/dia.py)."""
    tile = tile_rows or DEFAULT_TILE_ROWS
    if variant != "auto":
        return variant, tile
    if tile % 8:
        # dbuf's flat-scratch slot slices and xres's window offsets need
        # (tile + span) * 128 to stay 1024-aligned (8-row granules); only
        # the single-buffered kernel (whole-scratch DMA target) accepts
        # arbitrary tile heights
        return "roll1", tile
    lead = x_lead_pad(offsets)
    shifts = [int(o) + lead for o in offsets]
    span = _span_rows(shifts)
    n_rows = nr_pad // LANES
    grid_rows = ((n_rows + tile - 1) // tile) * tile
    x_len = (grid_rows + span) * LANES
    data_block = len(offsets) * tile * LANES * data_bytes
    y_block = tile * LANES * x_bytes
    if _conservative_vmem():
        # unmeasured TPU generation (or CPU): the old safe budget — x
        # counted twice against ~15 MB, so xres can never overflow a
        # 16 MB-VMEM part (the 24 MB cutoff + raised vmem limit below
        # are v5e-measured; code-review r3 finding)
        budget = 2 * x_len * x_bytes + 2 * (data_block + y_block)
        if budget <= 15 * 1024 * 1024:
            return "xres", tile
        return "dbuf", tile
    # x counted once: constant-index-map operands are single-buffered
    # (proved by the 67 MB grid=512 run — see VMEM_BUDGET_BYTES note)
    budget = x_len * x_bytes + 2 * (data_block + y_block)
    if budget <= XRES_BUDGET_BYTES:
        return "xres", tile
    # Beyond small x: dbuf (sliding double-buffered window) measured at
    # HBM roofline once the data operand is build-time grid-padded —
    # 0.614 ms / 813 GB/s physical at 200^3 (r3 sweep; win 0.63-0.64,
    # xres 0.74-0.76). The window re-reads ride under the dominant
    # diagonal-data stream, so the chunk-resident "win" kernel buys
    # nothing at auto sizes; it stays available as an explicit variant.
    return "dbuf", tile


def _span_rows(shifts) -> int:
    """x-window rows beyond the tile, padded to a sublane multiple so the
    manual DMA and the VMEM scratch stay 8-row aligned."""
    raw = max(shifts) // LANES + 2
    return ((raw + 7) // 8) * 8


def x_lead_pad(offsets: Sequence[int]) -> int:
    """Leading zero padding (elements, multiple of 128) covering the most
    negative diagonal shift."""
    m = -min(0, min(offsets))
    return ((m + LANES - 1) // LANES) * LANES


def pack_x(
    x: jnp.ndarray,
    offsets: Sequence[int],
    nr_pad: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
) -> jnp.ndarray:
    """Pad a flat x (length >= nr) into the kernel's 1-D layout."""
    lead = x_lead_pad(offsets)
    shifts = [int(o) + lead for o in offsets]
    span = _span_rows(shifts)
    grid_rows = ((nr_pad // LANES + tile_rows - 1) // tile_rows) * tile_rows
    total = (grid_rows + span) * LANES
    return jnp.zeros(total, x.dtype).at[lead : lead + x.shape[0]].set(x[: nr_pad])
