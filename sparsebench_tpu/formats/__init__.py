"""Device matrix formats (runtime-selectable).

The reference picks one of CRS / SCS / CCRS per *binary* (Makefile:20,32,
``#ifdef`` dispatch in src/matrix.h:14-22). Here formats are runtime objects
sharing one protocol: build from the :class:`HostCSR` intermediate, expose a
jittable ``spmv``. TPU-native additions beyond the reference's lineup:

=========  ====================================================================
``crs``    reference-parity CRS; device SpMV via gather + segmented reduce
``ccrs``   reference-parity interleaved CRS (same device layout as crs; kept
           for CLI/API parity — on TPU AoS interleaving has no meaning)
``sell``   SELL-C-sigma, the flagship general format (Kreutzer et al.,
           arXiv:1307.6209); sigma-sorted, chunked, padded to lane tiles
``ell``    padded ELLPACK (SELL with one global chunk); simplest dense layout
``dia``    diagonal storage for banded/stencil matrices — gather-free SpMV
           from shifted slices; Pallas kernel with VMEM-resident x window
``bsell``  block-column SELL — the round-2 general format: per-slice
           lane-gathers from 128-wide column blocks, whole x VMEM-resident,
           int8 local indices (5 B/nnz); see ops/bsell_pallas.py
``bslab``  slab-table BSELL — the round-3 flagship general format: tall
           (sub,128) slices whose x-table is one contiguous slab; affine
           slices store a rotation scalar instead of an index plane;
           memory-bound at the STREAM roofline (ops/bslab_pallas.py)
=========  ====================================================================
"""

from sparsebench_tpu.formats.registry import FORMATS, get_format, from_csr

__all__ = ["FORMATS", "get_format", "from_csr"]
