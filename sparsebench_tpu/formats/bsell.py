"""BSELL — block-column SELL, the TPU-native general sparse format.

Motivation and kernel contract: see ops/bsell_pallas.py. Layout summary:
rows group 128-consecutive per lane-group (8 groups per tile of 1024 rows);
entries bucket by 128-wide column block; per (lane-group, block) rows pad
to the longest per-row count, giving "slices" of 128 entries whose columns
share one block per sublane. No row permutation is involved — unlike
SELL-C-sigma, BSELL is a drop-in layout (padding is bounded by column
*locality* rather than row-length skew, so bandwidth-reducing orderings
help but row sorting is unnecessary).

This is the intended fast path for arbitrary matrices on TPU; `dia` stays
the fast path for strictly banded ones, and `sell` remains the
reference-parity SELL-C-sigma implementation (golden-file layout).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.base import default_policy, round_up, take
from sparsebench_tpu.formats.registry import register_format
from sparsebench_tpu.host.csr import HostCSR
from sparsebench_tpu.ops.bsell_pallas import (
    LANES,
    SUBLANES,
    TILE_ROWS,
    bsell_spmv_pallas,
)

_VMEM_BUDGET = 10 * 1024 * 1024  # x2d + double-buffered slice blocks

VALID_IMPLS = (
    "auto", "xla", "pallas", "pallas_interpret", "pallas_win",
    "pallas_win_interpret", "pallas_win2", "pallas_win2_interpret",
)


def _check_impl(impl: str) -> None:
    """See formats/dia.py _check_impl: typos must not silently select the
    slow XLA fallback."""
    if impl not in VALID_IMPLS:
        raise ValueError(
            f"unknown bsell impl {impl!r}; valid: {', '.join(VALID_IMPLS)}"
        )


def _backend_is_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


# (sz, sy, sx) in the reference generator's loop order (src/matrix.c:71-75)
_OFFSETS_27 = [
    (sz, sy, sx) for sz in (-1, 0, 1) for sy in (-1, 0, 1) for sx in (-1, 0, 1)
]


@functools.partial(
    jax.jit,
    static_argnames=("slices", "nx", "ny", "local_nrow", "n_tiles",
                     "w_blocks", "nb", "store_dt"),
)
def _stencil_bsell_device(slices, nx, ny, local_nrow, n_tiles, w_blocks, nb,
                          store_dt, base_blocks):
    """Generate the 27/7-pt stencil's BSELL arrays ON DEVICE (no host build,
    no host->device transfer — the relay moves ~0.3 MB/s, which made the
    round-1 200^3 host build+transfer take ~57 min).

    Structure: the stencil's entries lie on ``ndiag`` diagonals. For rows of
    one 128-lane group (i = 128g + l) and diagonal offset o = 128q + r, the
    columns i + o = 128(g+q) + (l+r) fall in block g+q for lanes l < 128-r
    and block g+q+1 for the rest — so each diagonal contributes at most two
    lane-complementary slices per group, with per-slice constant local
    indices (l+r) mod 128 and linear-in-g block ids. Everything is iota
    arithmetic + masks; no scatter, no gather.
    """
    nr_pad = n_tiles * TILE_ROWS
    i = jax.lax.iota(jnp.int32, nr_pad)
    ix = i % nx
    iy = (i // nx) % ny
    valid = i < local_nrow
    lane = i % LANES
    counts = jnp.zeros(nr_pad, jnp.int32)
    planes = []
    for off, sz, sy, sx, _q, r, is_b in slices:
        col = i + off
        m = (
            valid
            & (ix + sx >= 0) & (ix + sx < nx)
            & (iy + sy >= 0) & (iy + sy < ny)
            & (col >= 0) & (col < local_nrow)
        )
        if not is_b:
            counts = counts + m
        sel = (lane + r >= LANES) if is_b else (lane + r < LANES)
        v = jnp.float32(27.0) if off == 0 else jnp.float32(-1.0)
        planes.append(
            jnp.where(m & sel, v, 0.0).astype(store_dt).reshape(
                n_tiles, SUBLANES, LANES
            )
        )
    vals = jnp.stack(planes, axis=1)

    lvec = (jax.lax.iota(jnp.int32, LANES)[None, :]
            + jnp.asarray([r for *_x, r, _b in slices], jnp.int32)[:, None]
            ) % LANES
    lidx = jnp.broadcast_to(
        lvec.astype(jnp.int8)[None, :, None, :],
        (n_tiles, len(slices), SUBLANES, LANES),
    )

    t_idx = jax.lax.iota(jnp.int32, n_tiles)
    qoff = jnp.asarray([q + b for *_x, q, _r, b in slices], jnp.int32)
    abs_blocks = (
        SUBLANES * t_idx[:, None, None]
        + jax.lax.iota(jnp.int32, SUBLANES)[None, None, :]
        + qoff[None, :, None]
    )
    rel = jnp.clip(abs_blocks, 0, nb - 1) - base_blocks[:, None, None]
    blocks = jnp.clip(rel, 0, 2 * w_blocks - 1)
    return vals, lidx, blocks, counts


def _build_arrays(csr: HostCSR, policy: DTypePolicy):
    """Vectorized host construction of the slice arrays."""
    nr, nc = csr.nr, csr.nc
    n_tiles = max(1, -(-nr // TILE_ROWS))
    nc_pad = max(LANES, round_up(nc, LANES))
    nb = nc_pad // LANES

    lens = csr.row_lengths
    rows = np.repeat(np.arange(nr, dtype=np.int64), lens)
    col = csr.col
    group = rows // LANES
    lane = rows % LANES
    block = col // LANES
    lidx = col % LANES

    nnz = csr.nnz
    if nnz == 0:
        s_max = 1
        vals = np.zeros((n_tiles, 1, SUBLANES, LANES), dtype=policy.value)
        lidx_arr = np.zeros((n_tiles, 1, SUBLANES, LANES), dtype=np.int32)
        blocks = np.zeros((n_tiles, 1, SUBLANES), dtype=np.int32)
        win_base = np.zeros((n_tiles, 1, 8), dtype=np.int32)
        wchunk = np.zeros(n_tiles, dtype=np.int32)
        return (vals, lidx_arr, blocks, win_base, wchunk, n_tiles, 1, nc_pad,
                8, 16)

    # occurrence index j within each (row, block) run — entries are sorted
    # by (row, col), so (row, block) runs are contiguous
    key_rb = rows * nb + block
    is_new = np.empty(nnz, dtype=bool)
    is_new[0] = True
    is_new[1:] = key_rb[1:] != key_rb[:-1]
    run_start = np.flatnonzero(is_new)
    run_id = np.cumsum(is_new) - 1
    j = np.arange(nnz, dtype=np.int64) - run_start[run_id]

    # per-(group, block): Lmax over the group's rows
    run_len = np.diff(np.append(run_start, nnz))
    key_gb_run = group[run_start] * nb + block[run_start]
    order = np.argsort(key_gb_run, kind="stable")
    kg_sorted = key_gb_run[order]
    len_sorted = run_len[order]
    gb_new = np.empty(kg_sorted.size, dtype=bool)
    gb_new[0] = True
    gb_new[1:] = kg_sorted[1:] != kg_sorted[:-1]
    gb_starts = np.flatnonzero(gb_new)
    gb_keys = kg_sorted[gb_starts]              # ascending (group, block)
    lmax_gb = np.maximum.reduceat(len_sorted, gb_starts)

    gb_group = gb_keys // nb
    gb_block = (gb_keys % nb).astype(np.int32)
    # slice offset of each (group, block): exclusive cumsum of lmax within
    # its group (gb_keys ascending groups -> per-group segments contiguous)
    csum = np.cumsum(lmax_gb)
    grp_new = np.empty(gb_group.size, dtype=bool)
    grp_new[0] = True
    grp_new[1:] = gb_group[1:] != gb_group[:-1]
    grp_first = np.flatnonzero(grp_new)
    base_before_group = np.zeros(gb_group.size, dtype=np.int64)
    base_before_group[grp_first[1:]] = csum[grp_first[1:] - 1]
    base_before_group = np.maximum.accumulate(base_before_group)
    offset_gb = csum - lmax_gb - base_before_group

    s_per_group = np.zeros(n_tiles * SUBLANES, dtype=np.int64)
    grp_sizes = csum[np.append(grp_first[1:] - 1, gb_group.size - 1)] - np.where(
        grp_first > 0, csum[grp_first - 1], 0
    )
    s_per_group[gb_group[grp_first]] = grp_sizes
    s_max = int(s_per_group.max())

    # entry -> slice
    key_gb_entry = group * nb + block
    gb_pos = np.searchsorted(gb_keys, key_gb_entry)
    slice_of = offset_gb[gb_pos] + j

    t = group // SUBLANES
    s = group % SUBLANES

    vals = np.zeros((n_tiles, s_max, SUBLANES, LANES), dtype=policy.value)
    lidx_arr = np.zeros((n_tiles, s_max, SUBLANES, LANES), dtype=np.int32)
    vals[t, slice_of, s, lane] = csr.val.astype(policy.value)
    lidx_arr[t, slice_of, s, lane] = lidx.astype(np.int32)
    # per-tile x window [min block, max block] over the tile's slices. The
    # windowed kernel views x as chunks of W = round_up(max span, 8) block
    # rows; tile t's span then always fits in chunks wchunk[t], wchunk[t]+1
    # (wchunk*W <= min < wchunk*W + W and hi < min + W). Block ids are
    # stored relative to wchunk*W, so they lie in [0, 2W); padding slices
    # stay at 0 (they gather x * 0).
    gb_tile = gb_group // SUBLANES
    win_lo = np.full(n_tiles, nb, dtype=np.int64)
    win_hi = np.zeros(n_tiles, dtype=np.int64)
    np.minimum.at(win_lo, gb_tile, gb_block)
    np.maximum.at(win_hi, gb_tile, gb_block)
    win_lo = np.minimum(win_lo, win_hi)  # empty tiles -> 0
    w_blocks = int(round_up(max(1, int((win_hi - win_lo).max() + 1)), 8))
    wchunk = win_lo // w_blocks
    base_blocks = wchunk * w_blocks
    # x rows the windowed kernel addresses: chunks [0, max wchunk + 2)
    xw_rows = int(wchunk.max() + 2) * w_blocks

    blocks = np.zeros((n_tiles, s_max, SUBLANES), dtype=np.int64)
    # fill the block table: (group, block) occupies slices
    # [offset_gb, offset_gb + lmax)
    rep = np.repeat(np.arange(gb_keys.size), lmax_gb)
    # vectorized per-(g,b) arange: offset + within-run position
    total = int(lmax_gb.sum())
    run_starts = np.cumsum(lmax_gb) - lmax_gb
    within = np.arange(total, dtype=np.int64) - np.repeat(run_starts, lmax_gb)
    slice_ids = np.repeat(offset_gb, lmax_gb) + within
    bt = gb_group[rep] // SUBLANES
    bs = gb_group[rep] % SUBLANES
    blocks[bt, slice_ids, bs] = gb_block[rep] - base_blocks[bt]
    return (vals, lidx_arr, blocks.astype(np.int32),
            np.broadcast_to(
                base_blocks.astype(np.int32)[:, None, None], (n_tiles, 1, 8)
            ).copy(),
            wchunk.astype(np.int32),
            n_tiles, s_max, nc_pad, w_blocks, xw_rows)


@register_format("bsell")
@struct.dataclass
class BsellMatrix:
    vals: jnp.ndarray    # (n_tiles, s_max, 8, 128)
    lidx: jnp.ndarray    # (n_tiles, s_max, 8, 128) int8/int32 lane indices
    blocks: jnp.ndarray  # (n_tiles, s_max, 8) int32 blocks RELATIVE to win_base
    win_base: jnp.ndarray  # (n_tiles, 1, 8) int32 chunk-aligned window base (replicated)
    wchunk: jnp.ndarray  # (n_tiles,) int32 x chunk index (win_base / w_blocks)
    nr: int = struct.field(pytree_node=False)
    nc: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    n_tiles: int = struct.field(pytree_node=False)
    s_max: int = struct.field(pytree_node=False)
    nc_pad: int = struct.field(pytree_node=False)
    w_blocks: int = struct.field(pytree_node=False)
    xw_rows: int = struct.field(pytree_node=False)
    n_elems: int = struct.field(pytree_node=False)
    impl: str = struct.field(pytree_node=False, default="xla")
    start_row: int = struct.field(pytree_node=False, default=0)
    total_nr: int = struct.field(pytree_node=False, default=0)
    total_nnz: int = struct.field(pytree_node=False, default=0)
    # True iff built from a zero-nnz CSR (single-shard boundary blocks):
    # split formats skip the whole kernel then — an EMPTY bsell pass
    # still costs ~0.17 ms at 100^3 plus its compile. Static at build
    # time, so it survives _normalize_statics' nnz zeroing; mixed
    # empty/non-empty shard sets are unified to False before stacking
    # (parallel/dist.py _unify_window_statics).
    empty: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def from_csr(
        cls,
        csr: HostCSR,
        policy: Optional[DTypePolicy] = None,
        *,
        impl: str = "auto",
        min_s_max: int = 0,
        index_store: str = "i8",
        compress: bool = True,
        **_opts,
    ) -> "BsellMatrix":
        policy = default_policy(policy)
        _check_impl(impl)
        nat = None
        if index_store == "i8" and np.dtype(policy.value) == np.float32:
            # native two-pass builder (ingest.cc): the numpy pipeline's
            # argsort/scatter passes over nnz-length arrays took ~57 min at
            # 200^3 on this host; the C++ passes take seconds
            from sparsebench_tpu.host.native import bsell_build_native

            store_bf16 = False
            if compress and csr.nnz:
                import ml_dtypes

                f32v = csr.val.astype(np.float32)
                bf = f32v.astype(ml_dtypes.bfloat16)
                store_bf16 = bool(np.array_equal(bf.astype(np.float32), f32v))
            nat = bsell_build_native(
                csr.row_ptr, csr.col, csr.val, csr.nr, store_bf16
            )
        if nat is not None:
            (vals, lidx, blocks, base_blocks, wchunk, n_tiles, s_max,
             w_blocks, xw_rows) = nat
            nc_pad = max(LANES, round_up(csr.nc, LANES))
            win_base = np.broadcast_to(
                base_blocks[:, None, None], (n_tiles, 1, 8)
            ).copy()
        else:
            (vals, lidx, blocks, win_base, wchunk, n_tiles, s_max, nc_pad,
             w_blocks, xw_rows) = _build_arrays(csr, policy)
            if compress and vals.dtype == np.float32:
                # lossless bf16 value compression (see formats/dia.py): only
                # applied when every value round-trips exactly
                import ml_dtypes

                bf = vals.astype(ml_dtypes.bfloat16)
                if np.array_equal(bf.astype(np.float32), vals):
                    vals = bf
            if index_store == "i8":
                # lane indices are < 128: int8 storage cuts index traffic 4x
                # (5 B/nnz vs the reference's 12 B/nnz model, main.c:187-189)
                lidx = lidx.astype(np.int8)
        if min_s_max > s_max:
            # distributed builds pad the slice axis so shard shapes match
            pad = min_s_max - s_max
            vals = np.pad(vals, ((0, 0), (0, pad), (0, 0), (0, 0)))
            lidx = np.pad(lidx, ((0, 0), (0, pad), (0, 0), (0, 0)))
            blocks = np.pad(blocks, ((0, 0), (0, pad), (0, 0)))
            s_max = min_s_max
        auto = impl == "auto"
        if auto:
            slice_bytes = s_max * SUBLANES * LANES * (policy.value_bytes + 4)
            whole_fits = (
                nc_pad * policy.value_bytes + 2 * slice_bytes < _VMEM_BUDGET
            )
            if _backend_is_tpu() and policy.value.itemsize <= 4:
                # beyond-VMEM x goes through the chunk-resident windowed
                # kernel (win2, ops/bsell_pallas.py): single-load row
                # fetches from a VMEM-resident chunk pair, re-DMA'd only
                # on chunk change — measured 3.4x the chunk-pipelined
                # operand variant at 200^3 (5.7 vs 19.5 ms) and equal to
                # the whole-x kernel's per-nnz rate
                impl = "pallas" if whole_fits else "pallas_win2"
            else:
                impl = "xla"
        obj = cls(
            vals=jnp.asarray(vals),
            lidx=jnp.asarray(lidx),
            blocks=jnp.asarray(blocks),
            win_base=jnp.asarray(win_base),
            wchunk=jnp.asarray(wchunk),
            nr=csr.nr,
            nc=csr.nc,
            nnz=csr.nnz,
            n_tiles=n_tiles,
            s_max=s_max,
            nc_pad=nc_pad,
            w_blocks=w_blocks,
            xw_rows=xw_rows,
            n_elems=int(np.prod(vals.shape)),
            impl=impl,
            start_row=csr.start_row,
            total_nr=csr.total_nr,
            total_nnz=csr.total_nnz,
            empty=csr.nnz == 0,
        )
        if (auto and obj.impl in ("pallas", "pallas_win", "pallas_win2")
                and not _self_check(obj, csr)):
            # kernel/runtime verification at build (see formats/dia.py)
            import sys

            print("bsell: pallas self-check failed; using XLA path",
                  file=sys.stderr)
            obj = obj.replace(impl="xla")
        return obj

    @classmethod
    def from_stencil(
        cls,
        nx: int,
        ny: int,
        nz: int,
        *,
        use_7pt: bool = False,
        policy: Optional[DTypePolicy] = None,
        impl: str = "auto",
        compress: bool = True,
    ) -> Tuple["BsellMatrix", jnp.ndarray]:
        """Build the 27/7-pt stencil matrix (reference src/matrix.c:30-121)
        directly in BSELL layout on device — see _stencil_bsell_device.
        Single-shard only (the distributed layer partitions CSR shards).

        Returns ``(matrix, row_counts)`` like DiaMatrix.from_stencil.
        """
        policy = default_policy(policy)
        _check_impl(impl)
        nr = nx * ny * nz
        plane = nx * ny
        specs = sorted(
            (sz * plane + sy * nx + sx, sz, sy, sx)
            for (sz, sy, sx) in _OFFSETS_27
            if not use_7pt or (sz * sz + sy * sy + sx * sx <= 1)
        )
        if len({s[0] for s in specs}) != len(specs):
            # degenerate tiny grids alias diagonals -> general CSR path
            from sparsebench_tpu.host.generator import generate_stencil

            csr = generate_stencil(nx, ny, nz, use_7pt=use_7pt,
                                   dtype=policy.value)
            obj = cls.from_csr(csr, policy, impl=impl, compress=compress)
            return obj, jnp.asarray(csr.row_lengths)

        # slice plan: A slice always, B slice when the lane shift wraps
        slices = []
        for off, sz, sy, sx in specs:
            q, r = divmod(off, LANES)
            slices.append((off, sz, sy, sx, q, r, 0))
            if r != 0:
                slices.append((off, sz, sy, sx, q, r, 1))
        s_max = len(slices)
        q_min = min(q for *_a, q, _r, b in slices if not b)
        q_max_eff = max(q + b for *_a, q, _r, b in slices)
        n_tiles = max(1, -(-nr // TILE_ROWS))
        nc_pad = max(LANES, round_up(nr, LANES))
        nb = nc_pad // LANES
        w_blocks = round_up(SUBLANES + q_max_eff - q_min, 8)
        t_np = np.arange(n_tiles, dtype=np.int64)
        wchunk = np.maximum(SUBLANES * t_np + q_min, 0) // w_blocks
        base_blocks = (wchunk * w_blocks).astype(np.int32)
        xw_rows = int(wchunk.max() + 2) * w_blocks

        use_bf16 = compress and np.dtype(policy.value) == np.float32
        if use_bf16:
            import ml_dtypes

            store_dt = jnp.dtype(ml_dtypes.bfloat16)
        else:
            store_dt = jnp.dtype(policy.value)
        vals, lidx, blocks, counts = _stencil_bsell_device(
            tuple(slices), nx, ny, nr, n_tiles, w_blocks, nb, store_dt,
            jnp.asarray(base_blocks),
        )
        counts = counts[:nr]
        nnz = int(counts.sum())

        auto = impl == "auto"
        if auto:
            slice_bytes = s_max * SUBLANES * LANES * (policy.value_bytes + 4)
            whole_fits = (
                nc_pad * policy.value_bytes + 2 * slice_bytes < _VMEM_BUDGET
            )
            if _backend_is_tpu() and policy.value.itemsize <= 4:
                impl = "pallas" if whole_fits else "pallas_win2"  # see from_csr
            else:
                impl = "xla"
        obj = cls(
            vals=vals,
            lidx=lidx,
            blocks=blocks,
            win_base=jnp.broadcast_to(
                jnp.asarray(base_blocks)[:, None, None], (n_tiles, 1, 8)
            ),
            wchunk=jnp.asarray(wchunk.astype(np.int32)),
            nr=nr,
            nc=nr,
            nnz=nnz,
            n_tiles=n_tiles,
            s_max=s_max,
            nc_pad=nc_pad,
            w_blocks=w_blocks,
            xw_rows=xw_rows,
            n_elems=n_tiles * s_max * SUBLANES * LANES,
            impl=impl,
            start_row=0,
            total_nr=nr,
            total_nnz=nnz,
        )
        return obj, counts

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        xp = jnp.zeros(self.nc_pad, x.dtype).at[: x.shape[0]].set(x)
        if self.impl in ("pallas", "pallas_interpret"):
            y3 = bsell_spmv_pallas(
                self.blocks,
                self.win_base,
                xp.reshape(-1, LANES),
                self.vals,
                self.lidx,
                interpret=self.impl == "pallas_interpret",
            )
        elif self.impl in ("pallas_win", "pallas_win_interpret",
                           "pallas_win2", "pallas_win2_interpret"):
            from sparsebench_tpu.ops.bsell_pallas import (
                bsell_spmv_win2,
                bsell_spmv_windowed,
            )

            # pad/crop x to the kernel's chunked extent (chunks [0, max wb+2))
            need = self.xw_rows * LANES
            if xp.shape[0] >= need:
                xp1 = xp[:need]
            else:
                xp1 = jnp.zeros(need, x.dtype).at[: xp.shape[0]].set(xp)
            call = (
                bsell_spmv_win2 if self.impl.startswith("pallas_win2")
                else bsell_spmv_windowed
            )
            y3 = call(
                self.wchunk,
                self.blocks,
                xp1.reshape(self.xw_rows, LANES),
                self.vals,
                self.lidx,
                w_blocks=self.w_blocks,
                interpret=self.impl.endswith("_interpret"),
            )
        else:
            gcol = (
                (self.blocks + self.win_base[:, :, :1])[:, :, :, None]
                * LANES
                + self.lidx.astype(jnp.int32)
            )
            g = take(xp, gcol.reshape(-1)).reshape(gcol.shape)
            y3 = (self.vals.astype(x.dtype) * g.astype(x.dtype)).sum(axis=1)
        return y3.reshape(-1)[: self.nr]

    @property
    def permuted_output(self) -> bool:
        return False

    def permute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v

    def unpermute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v

    @property
    def padding_ratio(self) -> float:
        """Stored slots / nnz — the format's padding overhead."""
        return self.n_elems / max(self.nnz, 1)


def with_window(A: "BsellMatrix", w_blocks: int) -> "BsellMatrix":
    """Re-express the window-relative block table with a FORCED chunk size
    so distributed shard builds share a treedef (the BSLAB analog is
    bslab.with_window; here the block ids are RELATIVE to win_base, so the
    table itself shifts).

    Safety bound: _build_arrays only guarantees stored relative ids lie in
    [0, 2W) — absolute ids in [win_base, win_base + 2W) — and padding
    slices sit at relative 0. Re-anchoring tile t at
    base' = (win_base // W') * W' keeps every id in [0, 2W') iff
    W' >= 2W - 8 (worst case: win_base' = win_base - (W' - 8), content up
    to win_base + 2W - 1). Callers needing to unify mismatched shards pick
    the target accordingly (see parallel/dist.py _unify_window_statics);
    W' == W is the no-op fast path."""
    if w_blocks == A.w_blocks:
        return A
    if w_blocks < 2 * A.w_blocks - 8 or w_blocks % 8:
        raise ValueError(
            f"forced w_blocks {w_blocks} cannot re-anchor a W={A.w_blocks} "
            f"window (need a multiple of 8 >= {2 * A.w_blocks - 8})"
        )
    win_base = np.asarray(A.win_base)[:, 0, 0].astype(np.int64)  # (n_tiles,)
    wchunk_new = win_base // w_blocks
    shift = (win_base - wchunk_new * w_blocks).astype(np.int32)
    base_new = (wchunk_new * w_blocks).astype(np.int32)
    xw_rows = int(wchunk_new.max() + 2) * w_blocks if wchunk_new.size else (
        2 * w_blocks
    )
    return A.replace(
        blocks=jnp.asarray(np.asarray(A.blocks) + shift[:, None, None]),
        win_base=jnp.asarray(
            np.broadcast_to(
                base_new[:, None, None], (A.n_tiles, 1, SUBLANES)
            ).copy()
        ),
        wchunk=jnp.asarray(wchunk_new.astype(np.int32)),
        w_blocks=w_blocks,
        xw_rows=xw_rows,
    )


def _self_check(obj: "BsellMatrix", csr: HostCSR) -> bool:
    """One compiled spmv against host row sums (A @ 1); falls back to the
    XLA path on mismatch (same guard as formats/dia.py)."""
    import sys

    want = np.zeros(csr.nr)
    np.add.at(
        want,
        np.repeat(np.arange(csr.nr), np.diff(csr.row_ptr)),
        csr.val.astype(np.float64),
    )
    scale = np.abs(want).max() or 1.0
    # retry both exceptions and mismatches: the dev-TPU relay occasionally
    # corrupts the FIRST execution after a fresh compile
    for attempt in range(3):
        try:
            y = np.asarray(obj.spmv(jnp.ones(obj.nc, jnp.float32)))
        except Exception as e:
            print(f"bsell pallas self-check attempt {attempt} raised: {e!r}",
                  file=sys.stderr)
            continue
        if np.isfinite(y).all() and np.abs(y - want).max() <= 1e-2 * scale:
            return True
        print(f"bsell pallas self-check attempt {attempt} mismatched",
              file=sys.stderr)
    return False
