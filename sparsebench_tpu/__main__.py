import os
import sys

from sparsebench_tpu.cli import main

rc = main()
# On the tunneled dev TPU the relay client's teardown thread has been
# observed spinning at 100% CPU for minutes after a completed run
# (NOTES.md). All user-visible work (prints, checkpoint/binfile writes)
# is flushed synchronously by main(), so a hard exit is safe — and only
# taken on the axon dev backend; normal interpreter shutdown otherwise.
# CONTRACT for new output writers (trace files, dumps, reports): flush/
# close synchronously before main() returns — atexit handlers and
# buffered writers registered for teardown will be skipped on this path
# (profiler.trace() already stops its jax trace inside the with-block).
# Probe only if main() already imported jax: initializing a backend here
# would dial (and claim) the TPU for host-only runs like `-c file.mtx`.
backend = ""
if "jax" in sys.modules:
    try:
        backend = sys.modules["jax"].default_backend()
    except Exception:  # pragma: no cover — backend init failed earlier
        backend = ""
if backend == "axon":
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
sys.exit(rc)
