"""Infrastructure utilities (reference components: timing.{h,c},
affinity.{h,c}, util.{h,c}, allocate.{h,c} — SURVEY §2 rows 14, 15, 17, 18).

TPU translations:
  * ``get_timestamp`` — monotonic wall clock (reference timing.c:8-20).
  * ``change_file_ending`` — reference util.c:11-31.
  * ``device_banner`` — the reference prints a rank -> host/pid/affinity map
    at startup (commPrintBanner, comm.c:185-274; affinity.c mask dump). The
    TPU analog is the device mesh table: id, kind, platform, memory stats.
  * ``device_memory_stats`` — the reference wraps posix_memalign with an
    exit-on-failure allocator (allocate.c:12-36); on TPU allocation is
    XLA's arena, so the useful parity surface is introspection, not
    allocation.
"""

from __future__ import annotations

import os
import socket
import time
from typing import List, Optional


def get_timestamp() -> float:
    """Reference getTimeStamp (timing.c:8-14)."""
    return time.monotonic()


def get_timer_resolution() -> float:
    """Reference getTimeResolution (timing.c:16-20)."""
    return time.get_clock_info("monotonic").resolution


def change_file_ending(filename: str, new_ending: str) -> str:
    """Reference changeFileEnding (util.c:11-31): swap the extension."""
    base = filename.rsplit(".", 1)[0]
    if not new_ending.startswith("."):
        new_ending = "." + new_ending
    return base + new_ending


def device_memory_stats(device) -> Optional[dict]:
    try:
        return device.memory_stats()
    except Exception:
        return None


def device_banner() -> str:
    """Device table (reference rank -> host/pid banner, comm.c:240-274)."""
    import jax

    host = socket.gethostname()
    pid = os.getpid()
    lines = [f"Process {pid} on host {host}:"]
    for d in jax.devices():
        stats = device_memory_stats(d)
        mem = ""
        if stats and "bytes_limit" in stats:
            used = stats.get("bytes_in_use", 0) / 1e9
            lim = stats["bytes_limit"] / 1e9
            mem = f"  mem {used:.1f}/{lim:.1f} GB"
        lines.append(
            f"  device {d.id}: {d.device_kind} ({d.platform}){mem}"
        )
    return "\n".join(lines)


def enable_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (XLA executables
    serialized to disk). The analytic device builds and Pallas kernels
    compile in ~4-12 s per shape on the dev chip and dominate "setup"
    (NOTES.md round 3); with the cache a fresh process reuses them.
    Safe no-op if the backend does not support serialization. The
    SB_NO_COMPILE_CACHE env var disables it (cold-compile measurement)."""
    if os.environ.get("SB_NO_COMPILE_CACHE"):
        return
    # Dev-relay runs only (or an explicit SB_COMPILE_CACHE opt-in): a
    # shared on-disk cache serving XLA:CPU AOT results across machine
    # configs was observed loading executables with mismatched CPU
    # feature sets ("could lead to execution errors such as SIGILL") —
    # CPU compiles are seconds anyway; the cache pays on the chip where
    # per-shape compiles cost 4-12 s.
    if not (os.environ.get("PALLAS_AXON_POOL_IPS")
            or os.environ.get("SB_COMPILE_CACHE")):
        return
    import jax

    path = cache_dir or os.environ.get(
        "SB_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax knob names
        pass


_IS_DEV_RELAY: Optional[bool] = None


def _on_dev_relay(resolve: bool = False) -> bool:
    """Whether this process runs on the tunneled dev TPU backend —
    resolved ONCE and cached. The exit helpers below must not touch jax
    at fire time: the r3 refine run wedged with NO watchdog thread
    present, i.e. the main thread never got through the arm call after
    the final print — and the only native-touching call in that window
    was this backend query. ``resolve=True`` (arm_dev_relay_deadline at
    driver entry) forces a definitive answer — importing jax if needed
    and falling back to the relay env marker if backend init fails —
    so a cached bool always exists by the time fire-time helpers run."""
    global _IS_DEV_RELAY
    if _IS_DEV_RELAY is not None:
        return _IS_DEV_RELAY
    import sys

    def _dbg(msg):
        if os.environ.get("SB_DEBUG_EXIT"):
            print(f"[sb-exit] {msg}", file=sys.stderr, flush=True)

    if resolve and "jax" not in sys.modules:
        import jax  # noqa: F401 — putting it in sys.modules IS the point
    if "jax" not in sys.modules:
        _dbg("probe: jax not imported")
        return False  # passive probe: don't cache, jax may come later
    try:
        backend = sys.modules["jax"].default_backend()
    except Exception as e:  # pragma: no cover — backend init failed
        _dbg(f"probe raised: {e!r}")
        if resolve:
            # claim race at driver entry: decide from the env marker so
            # the deadline still arms (the whole point of resolve mode)
            _IS_DEV_RELAY = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
            _dbg(f"resolved from env: dev_relay={_IS_DEV_RELAY}")
            return _IS_DEV_RELAY
        return False  # don't cache a failed passive probe
    # The relay plugin has reported its platform as 'axon' AND (after a
    # relay update mid-r3) as plain 'tpu' — with the latter, every
    # name-gated guard silently no-ops and the teardown wedge returns
    # (measured: instrumented CLI run, backend='tpu'). The robust marker
    # is the relay env itself: PALLAS_AXON_POOL_IPS set (sitecustomize
    # dials the relay) and a non-cpu backend.
    _IS_DEV_RELAY = backend == "axon" or (
        bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and backend != "cpu"
    )
    _dbg(f"backend={backend!r} dev_relay={_IS_DEV_RELAY}")
    return _IS_DEV_RELAY


def hard_exit_if_dev_relay(rc: int = 0) -> None:
    """Hard-exit the process on the tunneled dev TPU backend (axon).

    The relay client has two observed wedge modes (NOTES.md): a client
    thread spinning at ~100% CPU after main returns, and — observed this
    round — the MAIN thread blocking inside interpreter teardown work
    (device-buffer GC through the relay) *before* returning from main,
    which a post-main guard in __main__ can never reach (a 100^3 CLI run
    printed all results, then burned 25 CPU-minutes without exiting).
    Call this at the end of every driver path, after ALL user-visible
    output is flushed. No-op off the axon backend, so tests (cpu) and
    normal installs keep ordinary interpreter shutdown. The same output
    contract as __main__'s guard applies: writers must flush/close
    synchronously before this point — atexit handlers are skipped.
    """
    import sys

    if _on_dev_relay():
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)


def arm_dev_relay_exit_watchdog(rc: int = 0, grace_s: float = 30.0) -> None:
    """Arm a daemon thread that hard-exits ``grace_s`` seconds from now
    (axon dev backend only; no-op elsewhere).

    Fourth observed relay wedge mode: the MAIN thread spinning at 100%
    in native relay-client code (state R, no syscall) after the final
    result print — unreachable by the in-line hard_exit_if_dev_relay
    call, which the main thread never gets to. A separate OS thread
    still gets scheduled, and os._exit works from any thread. Call this
    once all user-visible output exists (buffers are flushed here and
    again by the watchdog); the grace period covers the normal exit
    path, which fires first via hard_exit_if_dev_relay in the common
    case. The thread is a daemon: a normal process exit kills it.
    """
    import sys

    if not _on_dev_relay():
        return
    import threading

    sys.stdout.flush()
    sys.stderr.flush()

    def _fire():
        time.sleep(grace_s)
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)

    threading.Thread(target=_fire, daemon=True,
                     name="sb-relay-exit-watchdog").start()


def arm_dev_relay_deadline(seconds: Optional[float] = None) -> None:
    """Last-resort wall-clock deadline for dev-relay runs (axon only).

    Fifth observed wedge mode (r3): a Mosaic compile ERROR inside a
    jitted call never finished propagating to Python — the process
    burned CPU in native error-path code, so __main__'s catch-all and
    every output-gated watchdog were unreachable (nothing to catch, no
    output to gate on). The only robust answer is a coarse deadline: a
    daemon thread that os._exit(124)s after SB_RELAY_DEADLINE seconds
    (default 2700 — above the ~20 min worst-case legitimate compile,
    NOTES.md). Arm once at driver entry; normal exits fire first. 0
    disables. No-op off the axon backend.
    """
    import sys

    if not _on_dev_relay(resolve=True):
        return
    src = "caller override"
    if seconds is None:
        seconds = float(os.environ.get("SB_RELAY_DEADLINE", "2700"))
        src = "SB_RELAY_DEADLINE"
    if seconds <= 0:
        return
    import threading

    def _fire():
        time.sleep(seconds)
        print(
            f"sparsebench: relay deadline ({seconds:.0f}s, {src}) "
            "exceeded — assuming a wedged relay client, hard-exiting 124",
            file=sys.stderr, flush=True,
        )
        sys.stdout.flush()
        os._exit(124)

    threading.Thread(target=_fire, daemon=True,
                     name="sb-relay-deadline").start()


def run_with_hard_exit(main_fn) -> None:
    """Run an entry point and ALWAYS leave via os._exit on the dev relay
    backend — the one place the five wedge modes' exit handling lives
    (see hard_exit_if_dev_relay / arm_dev_relay_exit_watchdog; NOTES.md).

    SystemExit keeps its semantics (message to stderr, code preserved);
    any other exception prints its traceback first (a propagating
    exception previously bypassed every exit guard and burned CPU for
    minutes post-traceback). Off the dev backend this ends with a normal
    sys.exit so tests and ordinary installs keep interpreter shutdown.
    """
    import sys

    rc = 1
    try:
        rc = main_fn()
    except SystemExit as e:
        if e.code is None:
            rc = 0
        elif isinstance(e.code, int):
            rc = e.code
        else:
            print(e.code, file=sys.stderr)
    except BaseException:
        import traceback

        traceback.print_exc()
    sys.stdout.flush()
    sys.stderr.flush()
    hard_exit_if_dev_relay(rc)
    sys.exit(rc)
