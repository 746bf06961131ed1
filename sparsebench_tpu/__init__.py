"""sparsebench_tpu — TPU-native sparse solver benchmark framework.

Public API (lazy re-exports). Resolution is deferred via PEP 562 so that
``import sparsebench_tpu`` stays jax-free: the CLI's host-only paths
(``-c file.mtx`` conversion, ``--help``) must not initialize a backend —
on the tunneled dev TPU, importing jax dials (and claims) the chip
(see __main__.py / NOTES.md).

    from sparsebench_tpu import (
        Parameter, DTypePolicy,          # config + .par files
        HostCSR, read_mm, generate_stencil,   # host ingest
        from_csr,                        # device format registry
        solve_cg, solve_gmres, solve_chebyshev,  # serial solvers
        build_distributed, dist_solve_cg,        # mesh-sharded solve
        Profiler,                        # region roofline report
    )
"""

from sparsebench_tpu.version import __version__  # noqa: F401

_EXPORTS = {
    # config (host-only, safe to import eagerly but kept uniform)
    "Parameter": "sparsebench_tpu.config",
    "DTypePolicy": "sparsebench_tpu.config",
    "read_parameter": "sparsebench_tpu.config",
    # host ingest (numpy-only)
    "HostCSR": "sparsebench_tpu.host",
    "read_mm": "sparsebench_tpu.host",
    "generate_stencil": "sparsebench_tpu.host",
    # device formats (imports jax)
    "from_csr": "sparsebench_tpu.formats",
    # solvers (import jax)
    "solve_cg": "sparsebench_tpu.solvers.cg",
    "check_residual": "sparsebench_tpu.solvers.cg",
    "init_vectors": "sparsebench_tpu.solvers.cg",
    "solve_gmres": "sparsebench_tpu.solvers.gmres",
    "solve_chebyshev": "sparsebench_tpu.solvers.chebyshev",
    # distributed (imports jax)
    "build_distributed": "sparsebench_tpu.parallel.dist",
    "dist_solve_cg": "sparsebench_tpu.parallel.dist",
    "dist_spmv": "sparsebench_tpu.parallel.dist",
    # profiler (host-side timers)
    "Profiler": "sparsebench_tpu.profiler",
}

__all__ = ["__version__", *_EXPORTS]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(__all__)
