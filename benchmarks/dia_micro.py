"""Microbenchmark: per-diagonal shifted-window strategies for the DIA
SpMV kernel (VERDICT r2 #6 — take the identified ~2x physical headroom).

The DIA kernel's inner loop materializes, for each diagonal with shift
s = q*128 + r, the window view out[j, l] = xwin[(q + j)*128 + l + r] and
accumulates data[d] * out. The round-2 kernel (ops/dia_pallas.py roll1)
does, per diagonal:

    xw2[q : q+rows+1]            # sublane-MISALIGNED slice (q arbitrary)
    pltpu.roll(., 128 - r)       # lane rotation
    rolled[:rows] / rolled[1:rows+1]   # second misaligned slice
    jnp.where(lane < 128-r, ...) # carry select

NOTES.md round-3 candidates: misaligned sublane slices force whole-tile
relayout copies; diagonals sharing q (the 27-pt stencil has 9 groups of 3
consecutive offsets) can share one window; the +1-row carry can be a
cheap sublane roll instead of a second misaligned slice. Variants:

  roll1       the round-2 kernel's scheme (baseline)
  carry_roll  per diag: misaligned slice + lane roll + sublane-roll(-1)
              carry + select (kills the second misaligned slice)
  grp_carry   carry_roll with the window slice HOISTED per distinct q
              (one slice serves every diagonal in the q-group)
  grp_align   grp_carry but the group window is an 8-ALIGNED slice
              followed by one sublane roll by (q % 8) (probes whether
              Mosaic charges for misaligned slices at all)
  qfloor      misaligned slice only, no lane shift (r==0 cost for all)
  floor       no addressing at all: fma-only compute/stream floor

All variants stream identical bytes (27 bf16 diagonal planes + whole-x
VMEM-resident) and compute bit-identical results (checked vs a numpy
oracle with the REAL 200^3 27-pt stencil shifts).

Usage: python benchmarks/dia_micro.py [tile_rows] [grid]
       (on CPU runs interpret-mode correctness checks only)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

VARIANTS = ("roll1", "carry_roll", "grp_carry", "grp_align", "qfloor",
            "floor")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def stencil_shifts(nx=200, ny=200):
    """The 27-pt stencil's 27 shifts at 200^3, offset to non-negative
    exactly like dia_spmv_pallas (x_lead_pad)."""
    offs = sorted(i + nx * j + nx * ny * k
                  for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1))
    m = -min(0, min(offs))
    lead = ((m + LANES - 1) // LANES) * LANES
    return tuple(o + lead for o in offs)


def _shift_plan(shifts):
    """[(q, r, d)] sorted by q so q-groups are contiguous."""
    plan = [(s // LANES, s % LANES, d) for d, s in enumerate(shifts)]
    plan.sort()
    return plan


def make_kernel(variant: str, shifts, rows: int, span: int):
    plan = _shift_plan(shifts)

    def select_carry(rolled, r):
        """out[j,l] = rolled[j + (l >= 128-r), l] with the carry row from
        a sublane roll by -1 (aligned [:rows] slices only)."""
        if r == 0:
            return rolled[:rows]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        carry = pltpu.roll(rolled, shift=rolled.shape[0] - 1, axis=0)
        return jnp.where(lane < LANES - r, rolled[:rows], carry[:rows])

    def body(x_ref, data_ref, y_ref):
        i = pl.program_id(0)
        xw = x_ref[pl.ds(i * rows * LANES, (rows + span) * LANES)]
        xw2 = xw.reshape(rows + span, LANES)
        acc = None

        def add(d, xs):
            nonlocal acc
            term = data_ref[d].astype(y_ref.dtype) * xs
            acc = term if acc is None else acc + term

        if variant == "roll1":
            for q, r, d in plan:
                if r == 0:
                    add(d, xw2[q : q + rows, :])
                    continue
                lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
                rolled = pltpu.roll(xw2[q : q + rows + 1, :],
                                    shift=LANES - r, axis=1)
                add(d, jnp.where(lane < LANES - r, rolled[:rows, :],
                                 rolled[1 : rows + 1, :]))
        elif variant == "carry_roll":
            for q, r, d in plan:
                w = xw2[q : q + rows + 8, :]
                if r == 0:
                    add(d, w[:rows])
                    continue
                rolled = pltpu.roll(w, shift=LANES - r, axis=1)
                add(d, select_carry(rolled, r))
        elif variant == "grp_carry":
            by_q: dict = {}
            for q, r, d in plan:
                by_q.setdefault(q, []).append((r, d))
            for q, group in by_q.items():
                w = xw2[q : q + rows + 8, :]
                for r, d in group:
                    if r == 0:
                        add(d, w[:rows])
                        continue
                    rolled = pltpu.roll(w, shift=LANES - r, axis=1)
                    add(d, select_carry(rolled, r))
        elif variant == "grp_align":
            by_q: dict = {}
            for q, r, d in plan:
                by_q.setdefault(q, []).append((r, d))
            for q, group in by_q.items():
                q8, rem = (q // 8) * 8, q % 8
                wa = xw2[q8 : q8 + rows + 16, :]
                w = pltpu.roll(wa, shift=wa.shape[0] - rem, axis=0) \
                    if rem else wa
                for r, d in group:
                    if r == 0:
                        add(d, w[:rows])
                        continue
                    rolled = pltpu.roll(w, shift=LANES - r, axis=1)
                    add(d, select_carry(rolled, r))
        elif variant == "qfloor":
            for q, r, d in plan:
                add(d, xw2[q : q + rows, :])
        elif variant == "floor":
            for _q, _r, d in plan:
                add(d, xw2[:rows, :])
        else:
            raise ValueError(variant)
        y_ref[:, :] = acc

    return body


@functools.partial(
    jax.jit,
    static_argnames=("variant", "shifts", "rows", "span", "interpret"),
)
def run_variant(x1d, data3d, *, variant, shifts, rows, span,
                interpret=False):
    grid = data3d.shape[1] // rows
    return pl.pallas_call(
        make_kernel(variant, shifts, rows, span),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((x1d.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(shifts), rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((data3d.shape[1], LANES), x1d.dtype),
        interpret=interpret,
    )(x1d, data3d)


def oracle(x1d, data3d, shifts):
    x = np.asarray(x1d, np.float64)
    dt = np.asarray(data3d, np.float64)
    nd, nrows, _ = dt.shape
    flat_idx = (np.arange(nrows * LANES)[None, :]
                + np.asarray(shifts)[:, None])  # (nd, n)
    xs = x[flat_idx]                            # (nd, n)
    y = (dt.reshape(nd, -1) * xs).sum(axis=0)
    return y.reshape(nrows, LANES)


def chain_time(x1d, data3d, kw, reps=200, trials=4):
    """Differential fused-chain timing (bench.py discipline): time(3R) -
    time(R) over 2R data-dependent chained calls cancels dispatch."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x1d, data3d, n):
        def step(c, _):
            y = run_variant(c, data3d, **kw)
            flat = y.reshape(-1)
            c2 = c.at[: flat.shape[0]].add(flat * jnp.float32(1e-30))
            return c2, ()
        out, _ = jax.lax.scan(step, x1d, None, length=n)
        return jnp.sum(out[::4097])

    for n in (reps, 3 * reps):
        float(chain(x1d, data3d, n))

    def timed(n):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(x1d, data3d, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(reps), timed(3 * reps)
    dt = (t_hi - t_lo) / (2 * reps)
    raw = t_hi / (3 * reps)
    return (dt if dt > 0 else raw), raw


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    shifts = stencil_shifts()
    span_raw = max(shifts) // LANES + 2
    span = ((span_raw + 7) // 8) * 8
    n_rows = tile * grid
    on_tpu = jax.default_backend() not in ("cpu",)
    log(f"backend: {jax.default_backend()}")
    if grid > 16 and on_tpu:
        # large grids: build ON DEVICE (host->device relay is 0.3-3 MB/s;
        # a 113 MB upload at grid=64 hangs for minutes) and skip the
        # numpy oracle (correctness is covered by the small-grid run)
        kx, kd = jax.random.split(jax.random.PRNGKey(0))
        x1d = jax.random.normal(kx, ((n_rows + span) * LANES,), jnp.float32)
        data3d = jax.random.normal(
            kd, (len(shifts), n_rows, LANES), jnp.float32
        ).astype(jnp.bfloat16)
        want = None
    else:
        rng = np.random.default_rng(0)
        x1d = jnp.asarray(
            rng.standard_normal((n_rows + span) * LANES).astype(np.float32))
        data3d = jnp.asarray(
            rng.standard_normal((len(shifts), n_rows, LANES))
            .astype(np.float32).astype(jnp.bfloat16))
        want = oracle(x1d, data3d, shifts)
    qs = sorted({s // LANES for s in shifts})
    log(f"27 shifts, {len(qs)} distinct q groups, span={span} rows, "
        f"tile={tile}, grid={grid}, data "
        f"{data3d.size * 2 / 1e6:.1f} MB/call")

    for v in VARIANTS:
        kw = dict(variant=v, shifts=shifts, rows=tile, span=span,
                  interpret=not on_tpu)
        exact = v not in ("qfloor", "floor")
        if want is not None:
            # (result download is also relay-bound; only at small grid)
            y = np.asarray(run_variant(x1d, data3d, **kw), np.float64)
            err = np.abs(y - want).max() / max(1.0, np.abs(want).max())
            if exact and err > 1e-2:  # bf16 data => ~1e-2 relative
                log(f"{v:11s} WRONG (rel err {err:.2e})")
                continue
        if not on_tpu:
            log(f"{v:11s} correct (interpret mode, no timing)")
            continue
        dt, raw = chain_time(x1d, data3d, kw)
        per_tile_diag = dt / grid / len(shifts) / (tile / 256) * 1e9
        bw = (data3d.size * 2 + (n_rows + span + n_rows) * LANES * 4) / dt
        log(f"{v:11s} {dt * 1e6:8.1f} us/call (raw {raw * 1e6:8.1f})  "
            f"{per_tile_diag:6.1f} ns/(256,128)/diag  "
            f"{bw / 1e9:6.1f} GB/s"
            + ("" if exact else "  [lower bound, wrong result]"))


if __name__ == "__main__":
    main()
