"""sparsebench_tpu — a TPU-native sparse solver benchmark framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RRZE-HPC/SparseBench (an MPI+OpenMP C benchmark of distributed CG and SpMV
over CRS / SELL-C-sigma / CCRS sparse formats; see SURVEY.md).

Design stance (TPU-first, not a port):
  * compile-time C polymorphism (one matrix format per binary,
    reference Makefile:20,32) becomes runtime format objects registered in
    :mod:`sparsebench_tpu.formats`;
  * MPI rank SPMD (reference src/comm.c) becomes ``shard_map`` over a
    ``jax.sharding.Mesh`` with XLA collectives (psum / ppermute / all_gather);
  * OpenMP/SIMD loops (reference src/matrix-*.c, src/solver.c) become XLA
    fused element-wise ops and Pallas kernels tiled to VPU lanes;
  * the two-stage matrix representation is kept: host ingest produces a
    :class:`~sparsebench_tpu.host.csr.HostCSR` intermediate (the reference's
    ``GMatrix``, src/matrix.h:29-35) which is lowered to a device-resident
    format before the solve.
"""

from sparsebench_tpu import _malloc_tuning

_malloc_tuning.apply()

from sparsebench_tpu.version import __version__

from sparsebench_tpu.config import Parameter, read_parameter, DTypePolicy

__all__ = [
    "__version__",
    "Parameter",
    "read_parameter",
    "DTypePolicy",
]
