"""Probe: can the TPU DMA engine do the DIA lane/sublane shift for free?

The DIA inner loop is VPU-bound at ~7 ops per vreg per diagonal
(misaligned window slice + lane roll + carry select + convert + fma).
If, once per chunk, we issue one async VMEM->VMEM copy PER DIAGONAL at
the diagonal's flat ELEMENT offset (q*128 + r), the destination scratch
holds a perfectly aligned (chunk_rows, 128) shifted window and the inner
loop collapses to convert + fma (~2-3 ops) — the memory roofline.

This probes: (a) does Mosaic accept element-misaligned VMEM->VMEM
make_async_copy on 1-D scratch refs, (b) what it costs vs the roll path.

Usage: python benchmarks/dia_shear.py   (interpret-mode check on CPU)
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def stencil_shifts(nx=200, ny=200):
    offs = sorted(i + nx * j + nx * ny * k
                  for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1))
    m = -min(0, min(offs))
    lead = ((m + LANES - 1) // LANES) * LANES
    return tuple(o + lead for o in offs)


def make_kernel(variant, shifts, rows, span, tpc):
    nd = len(shifts)

    def body(x_hbm, data_ref, y_ref, xwin, shear, sem, ssem, prev_ref):
        i = pl.program_id(0)
        c = i // tpc
        win_elems = (tpc * rows + span + 8) * LANES

        @pl.when(jnp.logical_or(i == 0, c != prev_ref[0]))
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(c * tpc * rows * LANES, win_elems)],
                xwin, sem,
            )
            cp.start()
            cp.wait()
            if variant == "shear_chunk":
                # one misaligned VMEM->VMEM copy per diagonal per CHUNK
                for d, s in enumerate(shifts):
                    pltpu.make_async_copy(
                        xwin.at[pl.ds(s, tpc * rows * LANES)],
                        shear.at[pl.ds(d * tpc * rows * LANES,
                                       tpc * rows * LANES)],
                        ssem,
                    ).start()
                for d in range(nd):
                    pltpu.make_async_copy(
                        xwin.at[pl.ds(shifts[d], tpc * rows * LANES)],
                        shear.at[pl.ds(d * tpc * rows * LANES,
                                       tpc * rows * LANES)],
                        ssem,
                    ).wait()

        prev_ref[0] = c
        off = (i - c * tpc) * rows
        acc = None
        for d, s in enumerate(shifts):
            if variant == "shear_chunk":
                xs = shear[pl.ds((d * tpc * rows + off) * LANES,
                                 rows * LANES)].reshape(rows, LANES)
            else:  # roll path (win_carry equivalent) for comparison
                q, r = divmod(s, LANES)
                w = xwin[pl.ds((off + q) * LANES, (rows + 8) * LANES)
                         ].reshape(rows + 8, LANES)
                if r:
                    rolled = pltpu.roll(w, shift=LANES - r, axis=1)
                    carry = pltpu.roll(rolled, shift=rolled.shape[0] - 1,
                                       axis=0)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, LANES), 1)
                    xs = jnp.where(lane < LANES - r, rolled[:rows],
                                   carry[:rows])
                else:
                    xs = w[:rows]
            term = data_ref[d].astype(y_ref.dtype) * xs
            acc = term if acc is None else acc + term
        y_ref[:, :] = acc

    return body


@functools.partial(
    jax.jit,
    static_argnames=("variant", "shifts", "rows", "span", "tpc", "interpret"),
)
def run(x1d, data3d, *, variant, shifts, rows, span, tpc, interpret=False):
    grid = data3d.shape[1] // rows
    win_elems = (tpc * rows + span + 8) * LANES
    return pl.pallas_call(
        make_kernel(variant, shifts, rows, span, tpc),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((len(shifts), rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((data3d.shape[1], LANES), x1d.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_elems,), x1d.dtype),
            pltpu.VMEM((len(shifts) * tpc * rows * LANES,), x1d.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(x1d, data3d)


def chain_time(x1d, data3d, kw, reps=60, trials=4):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x1d, data3d, n):
        def step(c, _):
            y = run(c, data3d, **kw)
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
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tpc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    shifts = stencil_shifts()
    span = ((max(shifts) // LANES + 2 + 7) // 8) * 8
    n_rows = rows * grid
    n_chunks = (grid + tpc - 1) // tpc
    rng = np.random.default_rng(0)
    x_len = (n_chunks * tpc * rows + span + 8) * LANES
    x1d = jnp.asarray(rng.standard_normal(x_len).astype(np.float32))
    data3d = jnp.asarray(
        rng.standard_normal((len(shifts), n_rows, LANES))
        .astype(np.float32).astype(jnp.bfloat16))
    on_tpu = jax.default_backend() not in ("cpu",)
    log(f"backend={jax.default_backend()} rows={rows} grid={grid} tpc={tpc} "
        f"data {data3d.size * 2 / 1e6:.1f} MB/call shear scratch "
        f"{len(shifts) * tpc * rows * LANES * 4 / 1e6:.1f} MB")

    # oracle
    xf = np.asarray(x1d, np.float64)
    dt64 = np.asarray(data3d, np.float64)
    want = np.zeros(n_rows * LANES)
    for d, s in enumerate(shifts):
        want += dt64[d].reshape(-1) * xf[s : s + n_rows * LANES]

    for v in ("roll", "shear_chunk"):
        kw = dict(variant=v, shifts=shifts, rows=rows, span=span, tpc=tpc,
                  interpret=not on_tpu)
        try:
            y = np.asarray(run(x1d, data3d, **kw), np.float64).reshape(-1)
        except Exception as e:
            log(f"{v:12s} FAILED: {type(e).__name__}: {e}")
            continue
        err = np.abs(y - want).max() / np.abs(want).max()
        if err > 1e-2:
            log(f"{v:12s} WRONG (rel err {err:.2e})")
            continue
        if not on_tpu:
            log(f"{v:12s} correct (interpret mode)")
            continue
        dt, raw = chain_time(x1d, data3d, kw)
        bw = (data3d.size * 2 + (n_rows + span) * LANES * 4
              + n_rows * LANES * 4) / dt
        log(f"{v:12s} {dt * 1e6:9.1f} us/call (raw {raw * 1e6:9.1f})  "
            f"{bw / 1e9:6.1f} GB/s-physical")


if __name__ == "__main__":
    main()
