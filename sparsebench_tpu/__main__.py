from sparsebench_tpu.cli import main

# Single exit path for the dev relay's wedge modes (NOTES.md): success,
# SystemExit, and crashes all leave via utils.run_with_hard_exit — a
# propagating exception previously bypassed every exit guard and burned
# CPU for minutes after its traceback printed. Output-writer contract:
# flush/close synchronously before main returns (atexit is skipped on
# the dev backend).
from sparsebench_tpu.utils import run_with_hard_exit

run_with_hard_exit(main)
