# Build/test/bench entry points (reference Makefile:40-66 target parity).

PY ?= python

.PHONY: all test flow_test unit_test bench bench_quick native format clean

all: native

# The full pytest suite on the virtual CPU mesh (unit + flow analogs).
# ulimit -s: XLA:CPU compilation of the fused construction programs
# (ops/graph_build.py build_scan) recurses deeply; the default 8 MB stack
# can SIGSEGV the compiler mid-suite.
test:
	bash -c 'ulimit -s 65536 2>/dev/null; $(PY) -m pytest tests/ -x -q'

unit_test: test
flow_test: test

# Headline benchmark on the available accelerator (one JSON line).
bench:
	$(PY) bench.py

bench_quick:
	$(PY) bench.py --quick

# Native components: CPU baseline scanner + host runtime library.
native:
	mkdir -p build
	g++ -O3 -march=native -funroll-loops -o build/bf_baseline native/bf_baseline.cpp
	g++ -O3 -march=native -shared -fPIC -o build/libvecsim_host.so native/vecsim_host.cpp -lpthread

format:
	$(PY) -m black vectorsimilarity_tpu tests 2>/dev/null || true

clean:
	rm -rf build __pycache__ */__pycache__
