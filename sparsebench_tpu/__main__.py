import sys

from sparsebench_tpu.cli import main

sys.exit(main())
