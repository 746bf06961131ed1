"""Process-wide cache of jitted solver loops.

Every solver driver used to build a fresh ``jax.jit(partial(loop_fn, ...))``
per solve call. jit caches traces per *callable object*, so each solve paid
a full XLA compile (~10-20 s for a fused 150-iteration loop at 100^3) even
when the operator, shapes and knobs were identical to the previous call —
the warm-up-then-time convention kept the *reported* numbers honest, but a
CLI or bench process doing N solves burned N compiles.

``jit_loop`` memoizes the jitted callable on (loop_fn, static knobs). The
knobs key the cache by equality: ints/floats/dtypes directly, callables via
object equality (bound methods such as ``A.spmv`` or ``dm.allsum`` compare
equal across attribute accesses of the same object; the module-level
identity defaults are singletons), and ChebPrecond is a frozen — hashable —
dataclass. An unhashable knob (an ad-hoc lambda closure) falls back to an
uncached jit, which is exactly the old behavior.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax


@lru_cache(maxsize=256)
def _cached(loop_fn, static_argnames, static_items):
    return jax.jit(partial(loop_fn, **dict(static_items)),
                   static_argnames=static_argnames)


def jit_loop(loop_fn, *, _static_argnames=(), **statics):
    """jax.jit(partial(loop_fn, **statics)), memoized process-wide.

    ``_static_argnames`` forwards to jax.jit for knobs that vary per CALL
    rather than per solver configuration (e.g. checkpoint's k_end)."""
    try:
        return _cached(
            loop_fn, tuple(_static_argnames),
            tuple(sorted(statics.items(), key=lambda kv: kv[0])),
        )
    except TypeError:  # unhashable static: uncached (legacy) path
        return jax.jit(partial(loop_fn, **statics),
                       static_argnames=_static_argnames)
