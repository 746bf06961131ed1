"""Split DIA+BSELL format for distributed banded matrices.

The halo renumbering destroys the banded structure of a shard's local
matrix (external columns land in the compacted tail, reference
comm.c:96-110), so plain DIA cannot represent distributed blocks
(formats/dia.py constraint). The split: entries with local columns
(< nr) keep the gather-free DIA fast path; the few boundary entries whose
columns point into the halo tail go through a BSELL block (whose
lane-gather kernel handles arbitrary columns). SpMV is the sum of the two
partial products — both kernels stream their own data once, and the
boundary part is a tiny fraction (the exchange faces).

Used by the distributed layer for ``--fmt dia``; not registered as a
standalone format (single-device DIA needs no split).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.bsell import BsellMatrix
from sparsebench_tpu.formats.bslab import BslabMatrix
from sparsebench_tpu.formats.dia import DiaMatrix
from sparsebench_tpu.host.csr import HostCSR


def split_interior_boundary(csr: HostCSR) -> Tuple[HostCSR, HostCSR]:
    """Partition entries into (cols < nr) interior and halo-tail boundary.

    O(nnz) with two passes and no per-entry row array: per-row interior
    counts come from the running sum of the mask sampled at row_ptr
    (the previous np.repeat + bincount build materialized a 8 B-per-nnz
    row index — ~1.7 GB and tens of host seconds at 200^3)."""
    interior_mask = csr.col < csr.nr
    run = np.zeros(csr.nnz + 1, dtype=np.int64)
    np.cumsum(interior_mask, out=run[1:])
    in_counts = run[csr.row_ptr[1:]] - run[csr.row_ptr[:-1]]

    def build(mask, counts, nc):
        row_ptr = np.zeros(csr.nr + 1, dtype=np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        return HostCSR(
            row_ptr=row_ptr,
            col=csr.col[mask],
            val=csr.val[mask],
            nr=csr.nr,
            nc=nc,
            start_row=csr.start_row,
            stop_row=csr.stop_row,
            total_nr=csr.total_nr,
            total_nnz=csr.total_nnz,
        )

    return (
        build(interior_mask, in_counts, csr.nr),
        build(~interior_mask, csr.row_lengths - in_counts, csr.nc),
    )


@struct.dataclass
class DiaSplitMatrix:
    interior: DiaMatrix
    boundary: BsellMatrix
    nr: int = struct.field(pytree_node=False)
    nc: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    start_row: int = struct.field(pytree_node=False, default=0)
    total_nr: int = struct.field(pytree_node=False, default=0)
    total_nnz: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_csr(
        cls,
        csr: HostCSR,
        policy: Optional[DTypePolicy] = None,
        *,
        forced_offsets=None,
        min_s_max: int = 0,
        impl: str = "auto",
        **_opts,
    ) -> "DiaSplitMatrix":
        # ``impl`` overrides the INTERIOR DiaMatrix kernel (the dominant
        # part); the boundary BSELL block stays auto-selected.
        interior_csr, boundary_csr = split_interior_boundary(csr)
        return cls(
            interior=DiaMatrix.from_csr(
                interior_csr, policy, forced_offsets=forced_offsets,
                impl=impl,
            ),
            boundary=BsellMatrix.from_csr(
                boundary_csr, policy, min_s_max=min_s_max
            ),
            nr=csr.nr,
            nc=csr.nc,
            nnz=csr.nnz,
            start_row=csr.start_row,
            total_nr=csr.total_nr,
            total_nnz=csr.total_nnz,
        )

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        # The explicit local-head slice makes the interior product's
        # independence from the halo exchange STRUCTURAL: the exchange
        # returns concat([x_local, received_tail]) (parallel/exchange.py),
        # XLA forwards slice-of-concat, so the dominant interior kernel
        # never waits on the collectives — the exchange rides under it
        # (latency-hiding scheduler). Only the tiny boundary product
        # consumes the wire data. The stored-format analog of the
        # matrix-free --overlap (parallel/stencil_dist.py).
        if self.boundary.empty:
            # single-shard builds have no halo entries: an EMPTY bsell
            # pass still costs a kernel launch (~0.17 ms at 100^3) plus
            # its compile — skip it statically (bsell.empty is a
            # build-time static, unified across shards before stacking)
            return self.interior.spmv(x[: self.nr])
        return self.interior.spmv(x[: self.nr]) + self.boundary.spmv(x)

    @property
    def permuted_output(self) -> bool:
        return False

    def permute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v

    def unpermute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v

    @staticmethod
    def plan(shard_csrs):
        """Unified (forced_offsets, min_s_max) so shard builds stack."""
        offsets = set()
        for s in shard_csrs:
            ic, _ = split_interior_boundary(s)
            rows = np.repeat(np.arange(ic.nr, dtype=np.int64), ic.row_lengths)
            offsets.update(np.unique(ic.col - rows).tolist())
        return tuple(sorted(offsets))


@struct.dataclass
class BslabSplitMatrix:
    """Split interior/boundary BSLAB for distributed general matrices.

    Same decomposition as DiaSplitMatrix, with the tall-slice BSLAB
    kernel (formats/bslab.py — the general-format STREAM-rate path) on
    the interior block and a small BSELL block for the halo-tail
    entries. The interior product reads only the LOCAL x head (sliced
    in spmv), so the halo-exchange collectives and the dominant
    interior kernel are structurally independent and XLA's
    latency-hiding scheduler overlaps the ICI transfer with the
    interior apply — the previous whole-shard bslab build consumed the
    exchanged vector in ONE kernel and therefore blocked on the wire
    every iteration (the reference's blocking MPI_Neighbor_alltoallv
    discipline, comm.c:627-651, which this removes)."""

    interior: "BslabMatrix"
    boundary: BsellMatrix
    nr: int = struct.field(pytree_node=False)
    nc: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    start_row: int = struct.field(pytree_node=False, default=0)
    total_nr: int = struct.field(pytree_node=False, default=0)
    total_nnz: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_csr(
        cls,
        csr: HostCSR,
        policy: Optional[DTypePolicy] = None,
        *,
        sub: int = 0,
        min_s_aff: int = 0,
        min_s_gen: int = 0,
        min_s_max: int = 0,
        impl: str = "auto",
        **_opts,
    ) -> "BslabSplitMatrix":
        # ``impl`` overrides the INTERIOR BSLAB kernel (the dominant
        # part); the boundary BSELL block stays auto-selected.
        interior_csr, boundary_csr = split_interior_boundary(csr)
        return cls(
            interior=BslabMatrix.from_csr(
                interior_csr, policy, sub=sub, min_s_aff=min_s_aff,
                min_s_gen=min_s_gen, impl=impl,
            ),
            boundary=BsellMatrix.from_csr(
                boundary_csr, policy, min_s_max=min_s_max
            ),
            nr=csr.nr,
            nc=csr.nc,
            nnz=csr.nnz,
            start_row=csr.start_row,
            total_nr=csr.total_nr,
            total_nnz=csr.total_nnz,
        )

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        # see DiaSplitMatrix.spmv: the local-head slice keeps the
        # interior kernel off the exchange's dependency chain (and the
        # empty-boundary skip saves the dead kernel on 1-shard builds)
        if self.boundary.empty:
            return self.interior.spmv(x[: self.nr])
        return self.interior.spmv(x[: self.nr]) + self.boundary.spmv(x)

    @property
    def padding_ratio(self) -> float:
        return float(getattr(self.interior, "padding_ratio", 1.0))

    @property
    def permuted_output(self) -> bool:
        return False

    def permute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v

    def unpermute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v
