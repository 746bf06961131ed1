import sys

from sparsebench_tpu.cli import main

# On the tunneled dev TPU the relay client wedges the interpreter at
# teardown (utils.hard_exit_if_dev_relay documents the modes). The
# driver paths hard-exit themselves on success; the cases left to this
# wrapper are SystemExit (flag errors) and CRASHES — an exception
# propagating out of main() previously bypassed every exit guard and a
# failed-compile run burned 12 CPU-minutes post-traceback (NOTES.md).
# So: print the error exactly like a normal interpreter would, THEN
# hard-exit on the dev backend. Output-writer contract as in utils.
rc = 1
try:
    rc = main()
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

from sparsebench_tpu.utils import hard_exit_if_dev_relay

hard_exit_if_dev_relay(rc)
sys.exit(rc)
