"""In-situ HBM read roofline via raw double-buffered DMA.

The XLA-level STREAM kernels (bench.py measure_stream_triad/_read) top
out ~670-775 GB/s on the dev v5e, yet the DIA/BSLAB Pallas kernels
measure 786-798 GB/s physical — their traffic is raw `make_async_copy`
DMA, which outruns anything XLA's fusion emits. A physical fraction
needs a denominator measured the same way, or honest kernels read as
>1.0x "anomalies" (VERDICT r3 next #5 wants every fraction <= 1.0 with
spread). This kernel IS that denominator: it streams an array through
VMEM with two-slot double-buffered DMA and touches each tile with one
vector add (so Mosaic cannot elide the copies), i.e. the fastest the
chip can READ through the same path the compute kernels use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 2048  # default (2048, 128) f32 tiles = 1 MB per DMA


def _read_kernel(x_hbm, out_ref, xwin, sem, *, n_tiles: int,
                 n_steps: int, tile_rows: int):
    """grid = (n_steps,) with n_steps = reps * n_tiles: the array streams
    end-to-end ``reps`` times inside ONE dispatch, so the ~30 ms relay
    round trip amortizes (a single pass measured 11 GB/s — all
    dispatch)."""
    i = pl.program_id(0)

    def dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds((step % n_tiles) * tile_rows, tile_rows), :],
            xwin.at[pl.ds(slot * tile_rows, tile_rows), :],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_steps)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    # one 8-row strip per step: enough of a data dependence to keep the
    # copies live, negligible VPU work
    strip = xwin[pl.ds((i % 2) * tile_rows, 8), :]

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = strip

    @pl.when(i > 0)
    def _():
        out_ref[:, :] += strip


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "reps", "tile_rows"))
def _read_passes(x2d, n_tiles: int, reps: int, tile_rows: int = TILE_ROWS):
    n_steps = reps * n_tiles
    return pl.pallas_call(
        functools.partial(_read_kernel, n_tiles=n_tiles, n_steps=n_steps,
                          tile_rows=tile_rows),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * tile_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x2d)


def measure_dma_read_gbps(n_floats: int = 64 * 1024 * 1024,
                          reps: int = 4, trials: int = 3,
                          tile_rows: int = TILE_ROWS) -> float:
    """Differential DMA read bandwidth: (t(3*reps) - t(reps)) / (2*reps)
    passes over an ``n_floats`` f32 array cancels the dispatch offset
    (same discipline as bench.py spmv_chain_stats)."""
    import time

    n_tiles = n_floats // (tile_rows * LANES)
    x = jnp.ones((n_tiles * tile_rows, LANES), jnp.float32)
    for r in (reps, 3 * reps):
        float(jnp.sum(_read_passes(x, n_tiles, r, tile_rows)))  # warm

    def timed(r):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jnp.sum(_read_passes(x, n_tiles, r, tile_rows)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(reps), timed(3 * reps)
    dt = (t_hi - t_lo) / (2 * reps)
    if dt <= 0:
        dt = t_hi / (3 * reps)
    return n_tiles * tile_rows * LANES * 4 / dt / 1e9
