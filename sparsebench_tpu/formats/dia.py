"""DIA (diagonal) device format — TPU-native fast path for banded matrices.

No reference equivalent: the reference's formats all gather x through a
column index array. On TPU the gather is the entire cost of SpMV (XLA's
gather lowering measured ~1 GB/s on v5e), and for banded/stencil matrices
(the reference's canonical workloads: the HPCG 27/7-pt generator,
src/matrix.c:30-121, and data/matrix_band_klein.mtx) it is avoidable:
store the matrix as its ``ndiag`` populated diagonals and compute

    y = sum_d  data[d, :] * x[offset_d : offset_d + nr]

— every x access is a contiguous shifted slice. Two execution paths:

  * **Pallas kernel** (ops/dia_pallas.py, default on TPU for f32/bf16):
    row tiles with the x window VMEM-resident, shifts as sublane slices +
    lane rolls; streams the diagonal data exactly once — speed-of-light
    byte count.
  * **XLA path** (fallback, any backend/dtype): jnp shifted slices; XLA
    fuses the multiply-adds but re-reads x per diagonal.

Constraints: square local matrices only (halo-renumbered distributed blocks
break the banded structure — the distributed layer splits local/remote
parts instead), and ``ndiag`` must stay small; ``from_csr`` raises
``DiaUnsuitableError`` otherwise so callers can fall back to SELL.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.base import default_policy, round_up
from sparsebench_tpu.formats.registry import register_format
from sparsebench_tpu.host.csr import HostCSR
from sparsebench_tpu.ops.dia_pallas import LANES, dia_spmv_pallas, pack_x

_MAX_DIAGS = 64

# (sz, sy, sx) in the reference generator's loop order (src/matrix.c:71-75).
_OFFSETS_27 = [
    (sz, sy, sx)
    for sz in (-1, 0, 1)
    for sy in (-1, 0, 1)
    for sx in (-1, 0, 1)
]


class DiaUnsuitableError(ValueError):
    """Matrix is not banded enough for DIA storage."""


VALID_IMPLS = ("auto", "xla", "pallas", "pallas_interpret")


def _check_impl(impl: str) -> None:
    """Reject typos/unknown kernel overrides loudly instead of silently
    falling through spmv's else-branch to the slow XLA path (the --impl
    flag exists to force a kernel; a typo must not quietly unforce it)."""
    if impl not in VALID_IMPLS:
        raise ValueError(
            f"unknown dia impl {impl!r}; valid: {', '.join(VALID_IMPLS)}"
        )


@functools.partial(
    jax.jit,
    static_argnames=("specs", "nx", "ny", "local_nrow", "total_nrow",
                     "start_row", "nr_pad", "store_dt"),
)
def _stencil_dia_device(specs, nx, ny, local_nrow, total_nrow, start_row,
                        nr_pad, store_dt):
    """Generate the 27/7-pt stencil's DIA data ON DEVICE: per (static)
    diagonal the values are a constant under three vectorized bound checks
    on iota-derived grid coordinates — no host arrays, no host->device
    transfer (the round-1 bench measured the 100^3 host build + relay
    transfer at 167 s; this is one small jit).

    Returns (data3d (ndiag, nr_pad/128, 128), counts (nr_pad,) int32).
    """
    local = jax.lax.iota(jnp.int32, nr_pad)
    ix = local % nx
    iy = (local // nx) % ny
    valid = local < local_nrow
    counts = jnp.zeros(nr_pad, jnp.int32)
    planes = []
    for off, sz, sy, sx in specs:
        col = local + (start_row + off)
        m = (
            valid
            & (ix + sx >= 0) & (ix + sx < nx)
            & (iy + sy >= 0) & (iy + sy < ny)
            & (col >= 0) & (col < total_nrow)
        )
        v = jnp.float32(27.0) if off == 0 else jnp.float32(-1.0)
        planes.append(jnp.where(m, v, 0.0).astype(store_dt))
        counts = counts + m
    data = jnp.stack(planes).reshape(len(specs), nr_pad // LANES, LANES)
    return data, counts


def _backend_is_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def _grid_pad(nr: int) -> int:
    """nr_pad for the DIA layout: 128-lane rows, and at benchmark scale
    rounded up to a multiple of 512 rows so every kernel tile height
    (128/256/512) divides the stored grid. Otherwise dia_spmv_pallas must
    jnp.pad the WHOLE data operand inside every call — measured r3 at
    200^3: a 432 MB read + write copy costing ~1.0 ms/SpMV, i.e. the
    entire gap between the kernel's ~845 GB/s micro rate
    (benchmarks/dia_micro.py grid=256) and the ~270 GB/s end-to-end rate.
    Kept lane-only for small matrices (the padded-row cost would dominate
    and call-time padding of a tiny operand is free)."""
    pad = max(LANES, round_up(nr, LANES))
    rows = pad // LANES
    if rows >= 4096 and rows % 512:
        pad = round_up(rows, 512) * LANES
    return pad


@register_format("dia")
@struct.dataclass
class DiaMatrix:
    # data3d[d, j, l] = A[i, i + offsets[d]] with i = j*128 + l (zero padded)
    # stored 3-D (the kernel's block layout) so no in-jit reshape is needed:
    # reshaping the 2-D form inside lax loop bodies produced layout
    # mismatches feeding the pallas blocked copy (garbage outputs)
    data: jnp.ndarray  # (ndiag, nr_pad/128, 128) value dtype
    offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    nr: int = struct.field(pytree_node=False)
    nc: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    n_elems: int = struct.field(pytree_node=False)
    nr_pad: int = struct.field(pytree_node=False)
    # execution: "pallas" | "xla" | "pallas_interpret" (CPU kernel testing)
    impl: str = struct.field(pytree_node=False, default="xla")
    start_row: int = struct.field(pytree_node=False, default=0)
    total_nr: int = struct.field(pytree_node=False, default=0)
    total_nnz: int = struct.field(pytree_node=False, default=0)
    # kernel schedule: "auto" picks xres (whole x VMEM-resident) when it
    # fits the VMEM budget, else the double-buffered window (measured on
    # the dev chip, see ops/dia_pallas.py); explicit values override.
    variant: str = struct.field(pytree_node=False, default="auto")
    tile_rows: int = struct.field(pytree_node=False, default=0)  # 0 = auto

    @classmethod
    def from_csr(
        cls,
        csr: HostCSR,
        policy: Optional[DTypePolicy] = None,
        *,
        max_diags: int = _MAX_DIAGS,
        impl: str = "auto",
        compress: bool = True,
        forced_offsets=None,
        **_opts,
    ) -> "DiaMatrix":
        policy = default_policy(policy)
        _check_impl(impl)
        if csr.nc != csr.nr:
            raise DiaUnsuitableError(
                f"DIA requires a square local matrix (nr={csr.nr}, nc={csr.nc})"
            )
        rows = np.repeat(np.arange(csr.nr, dtype=np.int64), csr.row_lengths)
        keys = csr.col - rows
        offsets = np.unique(keys)
        if forced_offsets is not None:
            # distributed builds force one diagonal set across shards so the
            # per-shard data arrays stack into a uniform mesh-sharded array
            forced = np.asarray(sorted(forced_offsets), dtype=np.int64)
            if not np.isin(offsets, forced).all():
                raise DiaUnsuitableError("forced_offsets misses populated diagonals")
            offsets = forced
        if offsets.size > max_diags:
            raise DiaUnsuitableError(
                f"{offsets.size} populated diagonals exceeds max_diags={max_diags}"
            )
        nr_pad = _grid_pad(csr.nr)
        data = np.zeros((offsets.size, nr_pad), dtype=policy.value)
        d_idx = np.searchsorted(offsets, keys)
        data[d_idx, rows] = csr.val.astype(policy.value)
        data = data.reshape(offsets.size, nr_pad // LANES, LANES)
        if compress and data.dtype == np.float32:
            # lossless bf16 compression: when every value round-trips
            # exactly (true for the generator's 27/-1 stencil values),
            # halve the dominant traffic term at zero accuracy cost;
            # the kernel accumulates in the x dtype
            import ml_dtypes

            bf = data.astype(ml_dtypes.bfloat16)
            if np.array_equal(bf.astype(np.float32), data):
                data = bf

        auto = impl == "auto"
        if auto:
            impl = (
                "pallas"
                if _backend_is_tpu() and policy.value.itemsize <= 4
                else "xla"
            )
        obj = cls(
            data=jnp.asarray(data),
            offsets=tuple(int(o) for o in offsets),
            nr=csr.nr,
            nc=csr.nc,
            nnz=csr.nnz,
            n_elems=offsets.size * csr.nr,
            nr_pad=nr_pad,
            impl=impl,
            start_row=csr.start_row,
            total_nr=csr.total_nr,
            total_nnz=csr.total_nnz,
        )
        if auto and obj.impl == "pallas" and os.environ.get("SB_SELF_CHECK"):
            # transient kernel/runtime corruption observed on the dev TPU
            # relay: verify once at build, fall back to the XLA path.
            # Opt-in (SB_SELF_CHECK=1): the check costs a full extra kernel
            # compile+execute — 15-200 s through this environment's remote
            # relay — and every driver (bench.py, cli solve paths) already
            # validates solver output end-to-end.
            want = np.zeros(csr.nr)
            np.add.at(
                want,
                np.repeat(np.arange(csr.nr), np.diff(csr.row_ptr)),
                csr.val.astype(np.float64),
            )
            if not _self_check(obj, want=want):
                import sys

                print("dia: pallas self-check failed; using XLA path",
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
        rank: int = 0,
        size: int = 1,
        use_7pt: bool = False,
        policy: Optional[DTypePolicy] = None,
        impl: str = "auto",
        compress: bool = True,
    ) -> Tuple["DiaMatrix", np.ndarray]:
        """Build the 27/7-pt stencil matrix (reference src/matrix.c:30-121)
        directly in DIA layout, skipping the CSR intermediate entirely.

        The generated matrix's populated diagonals are analytically known
        (offset = sz*nx*ny + sy*nx + sx per neighbor), its values are the
        constants 27.0 / -1.0, and validity per row is three vectorized
        bound checks — so the whole device format materializes with 27
        masked stores instead of a 27M-entry repeat/unique/scatter pipeline.
        On this host that turns a minutes-scale build (first-touch faults
        over ~1 GB of CSR temporaries) into seconds.

        Returns ``(matrix, row_counts)`` — row_counts feeds the reference's
        b = 27 - (nnzrow - 1) exact-solution setup (src/CGSolver.c:25-36)
        without a CSR to count from.
        """
        policy = default_policy(policy)
        _check_impl(impl)
        local_nrow = nx * ny * nz
        total_nrow = local_nrow * size
        start_row = local_nrow * rank
        plane = nx * ny

        specs = [
            (sz * plane + sy * nx + sx, sz, sy, sx)
            for (sz, sy, sx) in _OFFSETS_27
            if not use_7pt or (sz * sz + sy * sy + sx * sx <= 1)
        ]
        offs = [s[0] for s in specs]
        if len(set(offs)) != len(offs):
            # degenerate tiny grids (nx or ny <= 2) can alias two neighbor
            # shifts onto one diagonal — fall back to the general CSR path
            from sparsebench_tpu.host.generator import generate_stencil

            csr = generate_stencil(nx, ny, nz, rank=rank, size=size,
                                   use_7pt=use_7pt, dtype=np.float64)
            return (
                cls.from_csr(csr, policy, impl=impl, compress=compress),
                csr.row_lengths,
            )
        specs.sort()  # match from_csr's np.unique-sorted offset order

        # bf16 is exact for the stencil's constants; build compressed
        # directly (from_csr proves round-trip equality, here it is static)
        use_bf16 = compress and np.dtype(policy.value) == np.float32
        if use_bf16:
            import ml_dtypes

            store_dt = np.dtype(ml_dtypes.bfloat16)
        else:
            store_dt = policy.value

        nr_pad = _grid_pad(local_nrow)
        data, counts_dev = _stencil_dia_device(
            tuple(specs), nx, ny, local_nrow, local_nrow * size, start_row,
            nr_pad, jnp.dtype(store_dt),
        )
        counts = counts_dev[:local_nrow]

        # from_csr derives offsets as global_col - local_row, which includes
        # the rank's start_row shift for stacked multi-rank grids — match it
        offsets = start_row + np.asarray([s[0] for s in specs], dtype=np.int64)
        nnz = int(counts.sum())
        auto = impl == "auto"
        if auto:
            impl = (
                "pallas"
                if _backend_is_tpu() and policy.value.itemsize <= 4
                else "xla"
            )
        obj = cls(
            data=data,
            offsets=tuple(int(o) for o in offsets),
            nr=local_nrow,
            nc=local_nrow,
            nnz=nnz,
            n_elems=len(specs) * local_nrow,
            nr_pad=nr_pad,
            impl=impl,
            start_row=start_row,
            total_nr=total_nrow,
            total_nnz=nnz if size == 1 else 27 * total_nrow,
        )
        if auto and obj.impl == "pallas" and os.environ.get("SB_SELF_CHECK"):
            want = 27.0 - (counts - 1)  # row sums of the stencil matrix
            if not _self_check(obj, want=want):
                import sys

                print("dia: pallas self-check failed; using XLA path",
                      file=sys.stderr)
                obj = obj.replace(impl="xla")
        return obj, counts

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.impl in ("pallas", "pallas_interpret"):
            return self._spmv_pallas(x, self.impl == "pallas_interpret")
        return self._spmv_xla(x)

    def _spmv_pallas(self, x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
        from sparsebench_tpu.ops.dia_pallas import choose_schedule

        out_dtype = x.dtype
        if x.dtype == jnp.bfloat16:
            # Mosaic rejects the kernels' in-kernel bf16 vector reshapes
            # ("infer-vector-layout: unsupported shape cast", measured on
            # the v5e with --dtype bf16) and the lane rolls accumulate in
            # the x dtype; stream x as f32 (the DIAGONALS keep their own,
            # possibly bf16-compressed, storage) and narrow the result.
            x = x.astype(jnp.float32)
        variant, tile_rows = choose_schedule(
            self.offsets, self.nr_pad, jnp.dtype(x.dtype).itemsize,
            self.data.dtype.itemsize, self.variant, self.tile_rows,
        )
        x1d = pack_x(x[: self.nr], self.offsets, self.nr_pad,
                     tile_rows=tile_rows)
        y2d = dia_spmv_pallas(
            self.data, x1d, self.offsets, self.nr_pad, tile_rows=tile_rows,
            interpret=interpret, variant=variant,
        )
        return y2d.reshape(-1)[: self.nr].astype(out_dtype)

    def _spmv_xla(self, x: jnp.ndarray) -> jnp.ndarray:
        nr = self.nr
        x = x[:nr]
        lo = -min(0, min(self.offsets))
        hi = max(0, max(self.offsets))
        xp = jnp.pad(x, (lo, hi))
        data2d = self.data.reshape(self.data.shape[0], -1)
        # accumulate in the x dtype (data may be stored compressed bf16)
        y = jnp.zeros(nr, dtype=x.dtype)
        for d, off in enumerate(self.offsets):
            y = y + data2d[d, :nr].astype(x.dtype) * xp[lo + off : lo + off + nr]
        return y

    def spmm(self, X: jnp.ndarray) -> jnp.ndarray:
        """Multi-RHS SpMV, (nc, k) -> (nr, k) = A @ X.

        Thin transpose wrapper over :meth:`spmm_kn` — on TPU a (n, k)
        slab with k < 128 pads its minor dim to the 128-lane tile, so
        every (1M, 8) f32 slab physically occupies 16x its logical
        bytes; all real work runs in the (k, n) layout, where the
        sublane tile (8 rows) matches k and the padding vanishes."""
        return self.spmm_kn(X.T).T

    def spmm_kn(self, X: jnp.ndarray) -> jnp.ndarray:
        """Multi-RHS SpMV in slab-major layout: X is (k, nc), returns
        (k, nr) = (A @ X.T).T.

        TPU-first rationale: SpMV is bandwidth-bound and the matrix is
        the dominant stream (the reference's byte model charges
        (value+index) bytes per nonzero per solve, src/main.c:187-189).
        With k right-hand sides the diagonal values are read ONCE for
        all k columns — per-RHS matrix traffic drops k-fold while the
        x/y traffic (irreducible) stays. The pallas path runs
        ops/dia_pallas.py _dia_kernel_mrhs (grid (tiles, k), column
        innermost: the data block is VMEM-resident across the k column
        steps); the XLA path broadcasts each diagonal against the slab,
        accumulating in the x dtype exactly like _spmv_xla so per-column
        results match the single-RHS operator bit-for-bit (ADVICE r4:
        the previous f32 upcast broke that claim for bf16)."""
        if self.impl in ("pallas", "pallas_interpret"):
            return self._spmm_kn_pallas(X, self.impl == "pallas_interpret")
        nr = self.nr
        X = X[:, :nr]
        lo = -min(0, min(self.offsets))
        hi = max(0, max(self.offsets))
        Xp = jnp.pad(X, ((0, 0), (lo, hi)))
        data2d = self.data.reshape(self.data.shape[0], -1)
        Y = jnp.zeros((X.shape[0], nr), dtype=X.dtype)
        for d, off in enumerate(self.offsets):
            Y = Y + data2d[d, :nr].astype(X.dtype)[None, :] * (
                Xp[:, lo + off : lo + off + nr]
            )
        return Y

    def _spmm_kn_pallas(self, X: jnp.ndarray, interpret: bool) -> jnp.ndarray:
        from sparsebench_tpu.ops.dia_pallas import (
            dia_spmm_pallas,
            x_lead_pad,
        )

        out_dtype = X.dtype
        if X.dtype == jnp.bfloat16:
            # same constraint as _spmv_pallas: stream x as f32, the
            # diagonals keep their (possibly bf16-compressed) storage
            X = X.astype(jnp.float32)
        lead = x_lead_pad(self.offsets)
        k = X.shape[0]
        x2d = jnp.zeros((k, lead + self.nr_pad), X.dtype)
        x2d = x2d.at[:, lead : lead + self.nr].set(X[:, : self.nr])
        y = dia_spmm_pallas(self.data, x2d, self.offsets, self.nr_pad,
                            interpret=interpret)
        return y.reshape(k, -1)[:, : self.nr].astype(out_dtype)

    @property
    def permuted_output(self) -> bool:
        return False

    def permute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v

    def unpermute_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return v


def _self_check(obj: "DiaMatrix", want: np.ndarray) -> bool:
    """One compiled spmv against host row sums (``want`` = A @ 1). Catches
    persistent kernel miscompiles/corruption; transient flakiness is
    additionally guarded by callers validating results (bench.py)."""
    import sys

    want = np.asarray(want, dtype=np.float64)
    scale = np.abs(want).max() or 1.0
    # retry both exceptions and mismatches: the dev-TPU relay occasionally
    # corrupts the FIRST execution after a fresh compile
    for attempt in range(3):
        try:
            y = np.asarray(obj.spmv(jnp.ones(obj.nc, jnp.float32)))
        except Exception as e:
            print(f"dia pallas self-check attempt {attempt} raised: {e!r}",
                  file=sys.stderr)
            continue
        if np.isfinite(y).all() and np.abs(y - want).max() <= 1e-2 * scale:
            return True
        print(f"dia pallas self-check attempt {attempt} mismatched",
              file=sys.stderr)
    return False
