"""Microbenchmark 2: per-iteration overhead vs slice height.

slab_micro.py round-1 result (dev v5e, 2026-08-17): EVERY per-slice
strategy — 8 scattered loads, one slab load, no load at all; int8 gather,
dynamic roll, no permutation; bf16 or f32 values — costs a flat
~11-13 ns per (8,128) slice. The per-slice work is 2-6 VPU ops, so the
cost is dominated by fixed per-iteration overhead (scalar addressing,
pipeline bubbles between small ops), NOT by the table assembly NOTES.md
round-2 blamed and NOT by bandwidth.

Hypothesis: taller slices amortize the fixed cost. A slice of
(SUB, 128) with SUB = 32 does 4x the work per iteration; if the
per-iteration overhead is ~7-9 cycles, throughput scales ~3-4x.

Variants per (SUB, dtype):
  sum     acc += vals[p]                      (pure value streaming)
  floor   acc += vals[p] * slab               (slab load, no permutation)
  roll    acc += vals[p] * roll(slab, -r)     (affine slices)
  gather  acc += vals[p] * take(slab, lidx)   (general slices)

Usage: python benchmarks/slab_micro2.py [total_slices_units]
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


def make_kernel(variant, s_max, sub):
    def body(meta_ref, x_ref, vals_ref, lidx_ref, y_ref):
        acc = jnp.zeros((sub, LANES), y_ref.dtype)
        for p in range(s_max):
            if variant == "sum":
                acc = acc + vals_ref[0, p].astype(acc.dtype)
                continue
            tbl = x_ref[pl.ds(meta_ref[0, p, 0], sub), :]
            if variant == "floor":
                g = tbl
            elif variant == "roll":
                g = pltpu.roll(tbl, -meta_ref[0, p, 1], axis=1)
            elif variant == "gather":
                g = jnp.take_along_axis(
                    tbl, lidx_ref[0, p].astype(jnp.int32), axis=1
                )
            else:
                raise ValueError(variant)
            acc = acc + vals_ref[0, p].astype(acc.dtype) * g
        y_ref[0] = acc

    return body


@functools.partial(
    jax.jit, static_argnames=("variant", "s_max", "sub", "interpret")
)
def run_variant(meta, x2d, vals, lidx, *, variant, s_max, sub,
                interpret=False):
    n_tiles = vals.shape[0]
    return pl.pallas_call(
        make_kernel(variant, s_max, sub),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, s_max, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, sub, LANES), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, sub, LANES), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, sub, LANES), x2d.dtype),
        interpret=interpret,
    )(meta, x2d, vals, lidx)


def chain_time(meta, x2d, vals, lidx, kw, reps=20, trials=3):
    @jax.jit
    def chain(meta, x2d, vals, lidx, n):
        def step(c):
            y = run_variant(meta, c, vals, lidx, **kw)
            flat = y.reshape(-1)
            newflat = jnp.concatenate(
                [flat, c.reshape(-1)[flat.shape[0]:]]
            )
            return newflat.reshape(c.shape)

        out = jax.lax.fori_loop(0, n, lambda _, c: step(c), x2d)
        return out, jnp.sum(out[::257, ::17])

    for n in (reps, 3 * reps):
        _, sv = chain(meta, x2d, vals, lidx, n)
        float(sv)

    def timed(n):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _, sv = chain(meta, x2d, vals, lidx, n)
            float(sv)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(reps), timed(3 * reps)
    dt = (t_hi - t_lo) / (2 * reps)
    return dt if dt > 0 else t_hi / (3 * reps)


def main():
    total_units = int(sys.argv[1]) if len(sys.argv) > 1 else 55296
    # total_units = number of (8,128) unit-slices processed, constant
    # across SUB so byte totals match (55296 = 54 * 1024)
    rng = np.random.default_rng(0)
    if jax.default_backend() == "cpu":
        log("CPU: smoke-run interpret only")
    results = {}
    for sub in (8, 16, 32, 64):
        s_max = 16  # slices per tile (keep SMEM/VMEM blocks modest)
        n_tiles = max(1, total_units // (s_max * (sub // 8)))
        n_xrows = n_tiles * sub + 64
        x2d = jnp.asarray(
            rng.standard_normal((n_xrows, LANES)).astype(np.float32)
        )
        lidx = jnp.asarray(
            rng.integers(0, LANES, (n_tiles, s_max, sub, LANES))
            .astype(np.int8)
        )
        t_idx = np.arange(n_tiles)[:, None]
        p_idx = np.arange(s_max)[None, :]
        dbase = np.clip(sub * t_idx + (p_idx % 17) - 8, 0,
                        n_xrows - sub).astype(np.int32)
        r = (p_idx % LANES).astype(np.int32) + np.zeros_like(dbase)
        meta = jnp.asarray(np.stack([dbase, r], axis=2))
        for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            vals = jnp.asarray(
                rng.standard_normal((n_tiles, s_max, sub, LANES)).astype(dt)
            )
            for variant in ("sum", "floor", "roll", "gather"):
                kw = dict(variant=variant, s_max=s_max, sub=sub,
                          interpret=jax.default_backend() == "cpu")
                try:
                    if jax.default_backend() == "cpu":
                        run_variant(meta, x2d, vals, lidx, **kw)
                        log(f"sub={sub} {dt_name} {variant}: interpret ok")
                        continue
                    t = chain_time(meta, x2d, vals, lidx, kw)
                except Exception as e:  # noqa: BLE001
                    log(f"sub={sub} {dt_name} {variant}: FAILED {e!r}")
                    continue
                n_units = n_tiles * s_max * (sub // 8)
                ns_unit = t / n_units * 1e9
                vb = 2 if dt_name == "bf16" else 4
                lb = 1 if variant == "gather" else 0
                gbps = (1024 * (vb + lb)) * n_units / t / 1e9
                results[(sub, dt_name, variant)] = (t, ns_unit, gbps)
                log(f"sub={sub:2d} {dt_name:4s} {variant:6s} "
                    f"{t * 1e3:7.3f} ms  {ns_unit:5.2f} ns/unit  "
                    f"{gbps:6.1f} GB/s streamed")
    print(repr(results))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    import os

    os._exit(0)
