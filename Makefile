# Developer entry points (reference Makefile:61-68 `make format` analog;
# lint configuration lives in pyproject.toml [tool.ruff]).

.PHONY: all native test lint format clean

all: native

native:
	$(MAKE) -C sparsebench_tpu/native

test:
	python -m pytest tests/ -x -q

lint:
	@command -v ruff >/dev/null 2>&1 || { echo "ruff not installed"; exit 1; }
	ruff check sparsebench_tpu tests bench.py

format:
	@command -v ruff >/dev/null 2>&1 || { echo "ruff not installed"; exit 1; }
	ruff check --fix sparsebench_tpu tests bench.py
	ruff format sparsebench_tpu tests bench.py

clean:
	$(MAKE) -C sparsebench_tpu/native clean
