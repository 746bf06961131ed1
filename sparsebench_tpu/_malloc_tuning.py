"""Memory-allocator tuning for lazy-memory virtualized hosts.

This environment (firecracker VM with on-demand memory) services first-touch
page faults through a VMM handler at 26-72 MB/s (measured), while
MAP_POPULATE'd mmaps of warm physical memory populate at 2-3 GB/s. Two
mitigations, applied once at package import:

1. glibc mallopt: raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD keeps large
   malloc blocks on the already-faulted heap instead of mmap/munmap churn
   (measured 5.7 s for a cumsum over 10M doubles cold, 0.04 s resident).
2. numpy data allocator (native/npalloc.cc via PyDataMem_SetHandler):
   allocations >= 1 MB come from a pool of MAP_POPULATE'd mmaps with
   per-size reuse, so big numpy temporaries never demand-fault. Disable
   with SB_NO_POOL_ALLOC=1; cap cached bytes with SB_POOL_CAP_BYTES.

No-op where glibc / the native build are unavailable.
"""

from __future__ import annotations

import ctypes
import os

_applied = False
_pool_installed = False


def apply() -> bool:
    global _applied
    if _applied:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok1 = libc.mallopt(M_TRIM_THRESHOLD, ctypes.c_int(2**31 - 1))
        ok2 = libc.mallopt(M_MMAP_THRESHOLD, ctypes.c_int(2**31 - 1))
        _applied = bool(ok1 and ok2)
    except Exception:
        _applied = False
    install_pool_allocator()
    return _applied


def install_pool_allocator() -> bool:
    """Install the pooled MAP_POPULATE numpy allocator (best effort)."""
    global _pool_installed
    if _pool_installed or os.environ.get("SB_NO_POOL_ALLOC"):
        return _pool_installed
    try:
        import importlib.util

        so = os.path.join(os.path.dirname(__file__), "native", "sb_npalloc.so")
        if not os.path.exists(so):
            import subprocess

            subprocess.run(
                ["make", "-C", os.path.dirname(so), "-s", "sb_npalloc.so"],
                check=True, capture_output=True, timeout=120,
            )
        spec = importlib.util.spec_from_file_location("sb_npalloc", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _pool_installed = bool(mod.install())
    except Exception:
        _pool_installed = False
    return _pool_installed
