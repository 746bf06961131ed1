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

from typing import Optional

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


def _backend_is_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


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
        return vals, lidx_arr, blocks, win_base, n_tiles, 1, nc_pad, 1

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
    # per-tile x window: [min block, max block] over the tile's slices, so
    # the windowed kernel DMAs only that span; padding slices point at the
    # window base (gathering x * 0)
    gb_tile = gb_group // SUBLANES
    win_base = np.full(n_tiles, nb, dtype=np.int64)
    win_hi = np.zeros(n_tiles, dtype=np.int64)
    np.minimum.at(win_base, gb_tile, gb_block)
    np.maximum.at(win_hi, gb_tile, gb_block)
    win_base = np.minimum(win_base, win_hi)  # empty tiles -> 0
    w_blocks = int(max(1, (win_hi - win_base).max() + 1))

    # block ids relative to win_base; padding slices stay at the base block
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
    blocks[bt, slice_ids, bs] = gb_block[rep] - win_base[bt]
    return (vals, lidx_arr, blocks.astype(np.int32),
            np.broadcast_to(
                win_base.astype(np.int32)[:, None, None], (n_tiles, 1, 8)
            ).copy(),
            n_tiles, s_max, nc_pad, w_blocks)


@register_format("bsell")
@struct.dataclass
class BsellMatrix:
    vals: jnp.ndarray    # (n_tiles, s_max, 8, 128)
    lidx: jnp.ndarray    # (n_tiles, s_max, 8, 128) int8/int32 lane indices
    blocks: jnp.ndarray  # (n_tiles, s_max, 8) int32 blocks RELATIVE to win_base
    win_base: jnp.ndarray  # (n_tiles, 1, 8) int32 per-tile x window base (replicated)
    nr: int = struct.field(pytree_node=False)
    nc: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    n_tiles: int = struct.field(pytree_node=False)
    s_max: int = struct.field(pytree_node=False)
    nc_pad: int = struct.field(pytree_node=False)
    w_blocks: int = struct.field(pytree_node=False)
    n_elems: int = struct.field(pytree_node=False)
    impl: str = struct.field(pytree_node=False, default="xla")
    start_row: int = struct.field(pytree_node=False, default=0)
    total_nr: int = struct.field(pytree_node=False, default=0)
    total_nnz: int = struct.field(pytree_node=False, default=0)

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
        (vals, lidx, blocks, win_base, n_tiles, s_max, nc_pad,
         w_blocks) = _build_arrays(csr, policy)
        if compress and vals.dtype == np.float32:
            # lossless bf16 value compression (see formats/dia.py): only
            # applied when every value round-trips exactly
            import ml_dtypes

            bf = vals.astype(ml_dtypes.bfloat16)
            if np.array_equal(bf.astype(np.float32), vals):
                vals = bf
        if index_store == "i8":
            # lane indices are < 128: int8 storage cuts index traffic 4x
            # (5 B/nnz total vs the reference's 12 B/nnz model)
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
            # pallas_win (beyond-VMEM x) stays explicit opt-in: verified at
            # small/mid sizes but crashed the TPU worker inside lax loops at
            # 200^3 (w_blocks=638) — see NOTES.md round-2 items
            impl = (
                "pallas"
                if _backend_is_tpu() and policy.value.itemsize <= 4
                and whole_fits
                else "xla"
            )
        obj = cls(
            vals=jnp.asarray(vals),
            lidx=jnp.asarray(lidx),
            blocks=jnp.asarray(blocks),
            win_base=jnp.asarray(win_base),
            nr=csr.nr,
            nc=csr.nc,
            nnz=csr.nnz,
            n_tiles=n_tiles,
            s_max=s_max,
            nc_pad=nc_pad,
            w_blocks=w_blocks,
            n_elems=int(np.prod(vals.shape)),
            impl=impl,
            start_row=csr.start_row,
            total_nr=csr.total_nr,
            total_nnz=csr.total_nnz,
        )
        if auto and obj.impl == "pallas" and not _self_check(obj, csr):
            # kernel/runtime verification at build (see formats/dia.py)
            import sys

            print("bsell: pallas self-check failed; using XLA path",
                  file=sys.stderr)
            obj = obj.replace(impl="xla")
        return obj

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
        elif self.impl in ("pallas_win", "pallas_win_interpret"):
            from sparsebench_tpu.ops.bsell_pallas import bsell_spmv_windowed

            # pad x so every tile window [base, base+W) is in range;
            # kept 1-D (unique layout — see ops/bsell_pallas.py)
            xp1 = jnp.concatenate([xp, jnp.zeros(self.w_blocks * LANES, x.dtype)])
            y3 = bsell_spmv_windowed(
                self.blocks,
                self.win_base,
                xp1,
                self.vals,
                self.lidx,
                w_blocks=self.w_blocks,
                interpret=self.impl == "pallas_win_interpret",
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
