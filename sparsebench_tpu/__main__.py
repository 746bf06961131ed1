import sys

from sparsebench_tpu.cli import main

rc = main()
# Backstop for return paths that did not go through a driver tail (the
# driver paths call this themselves — cli.main/run_distributed/
# run_distributed_stencil): on the tunneled dev TPU the relay client can
# wedge the interpreter at teardown, so exit hard once all output is
# flushed. No-op off the axon backend; see utils.hard_exit_if_dev_relay
# for the wedge modes and the output-writer flush contract.
from sparsebench_tpu.utils import hard_exit_if_dev_relay

hard_exit_if_dev_relay(rc)
sys.exit(rc)
