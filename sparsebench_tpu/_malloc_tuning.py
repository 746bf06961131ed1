"""glibc malloc tuning for lazy-memory virtualized hosts.

This environment (firecracker VM with on-demand memory) services first-touch
page faults through a VMM handler at ~100x normal cost. glibc hands every
large allocation to mmap and returns it to the OS on free, so *each* big
numpy temporary re-faults its pages: measured 5.7 s for a cumsum over 10M
doubles, 0.04 s once the pages stay resident. Raising M_MMAP_THRESHOLD /
M_TRIM_THRESHOLD keeps large blocks on the (already-faulted) heap, making
host-side matrix builds ~100x faster after warm-up.

No-op where glibc is unavailable. Applied once at package import.
"""

from __future__ import annotations

import ctypes

_applied = False


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
    return _applied
