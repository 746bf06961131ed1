"""Host-side (numpy) ingest and intermediate representations.

Mirrors the reference's ingest layer (src/matrix.c, src/mmio.c,
src/matrixBinfile.c): everything here runs on the host CPU and produces a
:class:`~sparsebench_tpu.host.csr.HostCSR` — the analog of the reference's
``GMatrix`` intermediate (src/matrix.h:29-35) — which device formats then
lower to TPU-resident layouts.
"""

from sparsebench_tpu.host.coo import COOMatrix
from sparsebench_tpu.host.csr import HostCSR
from sparsebench_tpu.host.mmio import read_mm, write_mm
from sparsebench_tpu.host.generator import generate_stencil

__all__ = ["COOMatrix", "HostCSR", "read_mm", "write_mm", "generate_stencil"]
