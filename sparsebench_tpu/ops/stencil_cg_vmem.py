"""Whole-solve VMEM-resident CG for the matrix-free stencil operator.

Round-4's fused variant fused the FRONT half of each CG iteration into
one kernel (ops/stencil_pallas.py stencil_axpy_apply_dots_pallas) and
measured 27.6 ms for 150 iterations at 100^3 — ~184 us/iteration against
a ~60 us vector-traffic roofline. The residue is structural: every
iteration still streams r/p/w/x through HBM across 2-4 XLA fusion
regions with launch gaps between them.

This kernel removes the HBM round trips entirely. At 100^3 the padded
vector space is (nz+2)*nyp x nxp = 10608 x 128 f32 = 5.4 MB, so the two
loop-carried vectors r and p LIVE IN VMEM (10.9 MB of the ~16 MB/core
budget, pallas_guide.md) for the whole solve; the stencil apply is
recomputed in-register from the resident p (the operator streams zero
matrix bytes, so a second apply costs VPU adds, not bandwidth), and x —
touched only by x += alpha*p — is the ONE vector still streamed, in
double-buffered z-slab chunks. Per iteration the kernel moves 2 x 5.4 MB
of HBM traffic (x in/out) instead of ~40 MB, and runs ZERO kernel
launches (the TPU grid is the iteration loop: grid=(itermax,), with the
sequential-grid scratch persistence the double-buffered kernels already
rely on).

Iteration recurrence, indexing and history semantics replicate
solvers/cg.py cg_fused_loop exactly (itself the reference recurrence,
src/CGSolver.c:94-129): hist[0] = ||r0||, hist[k] = sqrt(rtrans) with
the k == 1 beta = 0 special case, the pAp <= rtrans*1e-30 breakdown
freeze, and eps-exit recorded as NaN history slots — per-iteration
scalars ride an SMEM scratch across grid steps, and the per-iteration
residual lands in its own grid-mapped (1, 128) history row (no dynamic
VMEM indexing anywhere).

Reductions are slab-partial f32 sums (pad rows/lanes are zero by the
padded-space contract, so full-tile sums are exact); iterates match the
XLA loops to reduction-order rounding, same as every other variant.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsebench_tpu.ops.stencil_pallas import _apply_window, pad_dims

LANES = 128

# VMEM plan: 2 resident vectors + 2 x-chunk slots + ~3 live apply
# windows. The CONSERVATIVE tier assumes the generic ~16 MB/core scoped
# VMEM; the BIG tier is for the v5/v6 generations whose 128 MB VMEM is
# measured (NOTES.md r3: 112 MB limits compile and stream) and engages
# ONLY when the conservative plan does not fit — at small grids the
# conservative plan's tz choice is also the measured-fastest (100^3:
# tz=10 beats 25/50 on chip), so a fitting small problem never widens.
_RESIDENT_BUDGET = 12 * 1024 * 1024
_TEMP_BUDGET = 2 * 1024 * 1024
_RESIDENT_BUDGET_BIG = 96 * 1024 * 1024
_TEMP_BUDGET_BIG = 15 * 1024 * 1024
_VMEM_LIMIT = 32 * 1024 * 1024
_VMEM_LIMIT_BIG = 112 * 1024 * 1024


def choose_tz_cg(nz: int, plane_bytes: int,
                 temp_budget: int = _TEMP_BUDGET) -> int:
    """Largest divisor of nz whose ~3 live (tz+2)-plane apply windows fit
    the temp budget, capped at 16 slabs of unroll (two applies per slab
    per iteration are unrolled in the program). SB_VMEM_TZ overrides
    (slab-granularity experiments)."""
    import os

    forced = os.environ.get("SB_VMEM_TZ")
    if forced and nz % int(forced) == 0:
        return int(forced)
    best = 0
    for tz in range(1, nz + 1):
        if nz % tz:
            continue
        if 3 * (tz + 2) * plane_bytes > temp_budget:
            continue
        if nz // tz > 16:
            continue
        best = tz
    return best


def _plan(nx: int, ny: int, nz: int, isz: int = 4):
    """(tz, big) for a viable residency plan, or None.

    x-dbuf slots (2*tz planes) ride inside the temp margin at the
    conservative tier; at the big tier they are charged explicitly so
    the 112 MB limit holds (200^3/tz=20: 86 resident + 14 windows +
    8.5 dbuf ~ 110 MB)."""
    nxp, nyp = pad_dims(nx, ny, nz)
    plane = nyp * nxp * isz
    rows = (nz + 2) * nyp
    tz = choose_tz_cg(nz, plane)
    if tz and 2 * rows * nxp * isz <= _RESIDENT_BUDGET:
        return tz, False
    from sparsebench_tpu.ops.dia_pallas import _conservative_vmem

    if _conservative_vmem():
        return None
    tz = choose_tz_cg(nz, plane, _TEMP_BUDGET_BIG)
    if not tz:
        return None
    total = (2 * rows * nxp * isz          # r + p resident
             + 3 * (tz + 2) * plane        # live apply windows
             + 2 * tz * plane)             # x dbuf slots
    if total > _VMEM_LIMIT_BIG - 2 * 1024 * 1024:  # stack margin
        return None
    return tz, True


def vmem_cg_viable(nx: int, ny: int, nz: int) -> bool:
    return _plan(nx, ny, nz) is not None


def _cg_kernel(
    eps_ref, r0_hbm, x_in_hbm, x_hbm, hist_ref,
    r_s, p_s, xbuf, sem_r, sem_xi, sem_xo, smem, *,
    nx: int, ny: int, nz: int, nxp: int, nyp: int, tz: int,
    use_7pt: bool,
):
    import os

    k = pl.program_id(0)
    n_slabs = nz // tz
    f32 = r_s.dtype  # compute dtype (f32 on chip; f64 in interpret tests)
    del x_in_hbm  # aliased to x_hbm (same buffer); all access via output
    # perf-diagnosis knobs (break correctness; never set in production):
    # "noapply" replaces A p with p, "nox" skips the x stream entirely
    _probe = os.environ.get("SB_VMEM_PROBE", "")

    def interior(a: int):
        # slab a's interior rows (pad rows inside are zero by contract)
        return pl.ds((1 + a * tz) * nyp, tz * nyp)

    def window(a: int):
        return pl.ds(a * tz * nyp, (tz + 2) * nyp)

    apply_real = functools.partial(_apply_window, nx=nx, ny=ny, nxp=nxp,
                                   nyp=nyp, tz=tz, use_7pt=use_7pt)

    def apply_w(v):
        if "noapply" in _probe:
            vc = v[nyp:(tz + 1) * nyp]
            return vc, vc
        return apply_real(v)

    def lane_sum(v):
        # sublane-only reduction to a (1, LANES) lane vector — the cheap
        # VPU direction. Scalar dots accumulate these per slab and pay
        # the cross-lane shuffle reduction ONCE per pass: with 3 dot
        # passes x n_slabs full jnp.sum()s the skeleton (probe knobs
        # noapply+nox) measured 161 us/iteration; per-slab scalar
        # reductions were the dominant per-iteration fixed cost.
        return jnp.sum(v, axis=0, keepdims=True)

    @pl.when(k == 0)
    def _init():
        cp = pltpu.make_async_copy(r0_hbm, r_s, sem_r)
        cp.start()
        cp.wait()
        p_s[...] = jnp.zeros(p_s.shape, f32)
        accv = jnp.zeros((1, r_s.shape[1]), f32)
        for a in range(n_slabs):
            rc = r_s[interior(a), :]
            accv = accv + lane_sum(rc * rc)
        acc = jnp.sum(accv)
        smem[0] = acc          # rtrans
        smem[1] = acc          # rtrans_prev
        smem[2] = jnp.zeros((), f32)  # done flag
        hist_ref[...] = jnp.full((1, 8, LANES), jnp.sqrt(acc), f32)

    @pl.when(k > 0)
    def _step():
        rtrans = smem[0]
        rtrans_prev = smem[1]
        done = smem[2]
        eps = eps_ref[0, 0]
        normr = jnp.sqrt(rtrans)
        # the while-loop cond in cg_loop/cg_fused_loop tests the normr
        # WRITTEN BY THE PREVIOUS body (one step stale): body k runs iff
        # ||r_{k-2}|| > eps — replicate the lag exactly or the solve
        # exits one iteration early vs the reference recurrence
        active = jnp.logical_and(done == 0, jnp.sqrt(rtrans_prev) > eps)
        hist_ref[...] = jnp.where(
            active, jnp.full((1, 8, LANES), normr, f32),
            jnp.full((1, 8, LANES), jnp.nan, f32),
        )
        # The whole body runs under ONE scalar branch: a frozen/converged
        # iteration touches nothing (r/p/x/smem unchanged — the NaN
        # history slot above is the only trace), and the hot path drops
        # the per-element jnp.where(active, ...) selects the r5 first cut
        # carried (two full-vector select passes per iteration). A single
        # per-grid-step branch around big work is NOT the per-slice
        # branching NOTES.md warns about.
        @pl.when(active)
        def _body():
            # beta: k == 1 reuses rtrans0 (reference first-iteration case)
            beta = jnp.where(
                jnp.logical_or(k == 1, rtrans_prev == 0),
                jnp.zeros((), f32), rtrans / jnp.where(rtrans_prev == 0, 1,
                                                       rtrans_prev),
            )
            # pass A1: p = r + beta*p
            for a in range(n_slabs):
                sl = interior(a)
                p_s[sl, :] = r_s[sl, :] + beta * p_s[sl, :]
            # pass A2: pAp = p . A p, apply recomputed from resident p
            papv = jnp.zeros((1, r_s.shape[1]), f32)
            for a in range(n_slabs):
                vc, w = apply_w(p_s[window(a), :])
                papv = papv + lane_sum(w * vc)
            pap = jnp.sum(papv)
            breakdown = pap <= rtrans * 1e-30
            # under breakdown alpha = 0: r/x pass through unchanged and
            # nrt recomputes to rtrans — the freeze semantics of the XLA
            # loops (solvers/cg.py safe_div guard)
            alpha = jnp.where(
                breakdown, jnp.zeros((), f32),
                rtrans / jnp.where(pap == 0, 1, pap),
            )

            # pass B: r -= alpha * A p (recomputed), rtrans' = r.r, and
            # the double-buffered x stream: x_slab += alpha * p_slab
            def xin(slot, a):
                return pltpu.make_async_copy(
                    x_hbm.at[interior(a), :], xbuf.at[slot], sem_xi.at[slot]
                )

            def xout(slot, a):
                return pltpu.make_async_copy(
                    xbuf.at[slot], x_hbm.at[interior(a), :], sem_xo.at[slot]
                )

            stream_x = "nox" not in _probe
            if stream_x:
                xin(0, 0).start()
            nrtv = jnp.zeros((1, r_s.shape[1]), f32)
            for a in range(n_slabs):
                if stream_x and a + 1 < n_slabs:
                    if a >= 1:
                        # the incoming chunk's slot must be clear of its
                        # previous out-DMA before the in-DMA overwrites it
                        xout((a + 1) % 2, a - 1).wait()
                    xin((a + 1) % 2, a + 1).start()
                vc, w = apply_w(p_s[window(a), :])
                sl = interior(a)
                rv = r_s[sl, :] - alpha * w
                r_s[sl, :] = rv
                nrtv = nrtv + lane_sum(rv * rv)
                if stream_x:
                    xin(a % 2, a).wait()
                    xbuf[a % 2] = xbuf[a % 2] + alpha * vc
                    xout(a % 2, a).start()
            if stream_x:
                xout((n_slabs - 1) % 2, n_slabs - 1).wait()
                if n_slabs > 1:
                    xout((n_slabs - 2) % 2, n_slabs - 2).wait()

            smem[0] = jnp.sum(nrtv)
            smem[1] = rtrans
            smem[2] = jnp.where(breakdown, jnp.ones((), f32), done)


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "nz", "itermax", "use_7pt", "interpret"),
)
def stencil_cg_vmem_pallas(
    r0: jnp.ndarray,           # (rows, nxp), padded space, = b - A x0
    x0: jnp.ndarray,           # (rows, nxp), padded space
    eps: jnp.ndarray,          # scalar (traced)
    nx: int, ny: int, nz: int,
    itermax: int,
    use_7pt: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x (rows, nxp), hist (itermax,) with NaN past the exit)."""
    nxp, nyp = pad_dims(nx, ny, nz)
    rows = (nz + 2) * nyp
    dt = r0.dtype
    isz = jnp.dtype(dt).itemsize
    plan = _plan(nx, ny, nz, isz)
    if plan is None:
        raise ValueError(
            f"vmem CG not viable at {nx}x{ny}x{nz} (resident "
            f"{2 * rows * nxp * isz / 2**20:.1f} MB)"
        )
    tz, big = plan
    kernel = functools.partial(
        _cg_kernel, nx=nx, ny=ny, nz=nz, nxp=nxp, nyp=nyp, tz=tz,
        use_7pt=use_7pt,
    )
    x_out, hist = pl.pallas_call(
        kernel,
        grid=(itermax,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps (1,1)
            pl.BlockSpec(memory_space=pl.ANY),    # r0 (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # x0 (HBM, aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x (HBM)
            pl.BlockSpec((1, 8, LANES), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),   # hist slab k
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, nxp), dt),
            jax.ShapeDtypeStruct((itermax, 8, LANES), dt),
        ],
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((rows, nxp), dt),                 # r resident
            pltpu.VMEM((rows, nxp), dt),                 # p resident
            pltpu.VMEM((2, tz * nyp, nxp), dt),          # x dbuf slots
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((8,), dt),
        ],
        # the lane-partial dot accumulators grew the Mosaic vector stack
        # ~1 MB past the default 16 MB scoped limit; this v5e accepts a
        # raised limit (NOTES.md r3: 112 MB operands compile and stream).
        # 32 MB also admits SB_VMEM_TZ slab-granularity experiments; the
        # big tier (200^3-class residency) uses the measured 112 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BIG if big else _VMEM_LIMIT,
        ) if not interpret else None,
        interpret=interpret,
    )(jnp.reshape(eps.astype(dt), (1, 1)), r0, x0)
    return x_out, hist[:, 0, 0]
