# Developer entry points (the reference drives everything through a Makefile
# as well; targets here mirror the useful subset).

PY ?= python
export JAX_COMPILATION_CACHE_DIR ?= /tmp/calibration_tpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES ?= -1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS ?= 0

.PHONY: test test-fast bench examples native clean

test:
	$(PY) -m pytest tests/ -q

test-fast:  # pure-python + cached-compile subsets
	$(PY) -m pytest tests/test_io_pipeline.py tests/test_native.py -q

bench:
	$(PY) bench.py

examples:
	$(PY) examples/generate_synthetic.py

native:
	g++ -O3 -fPIC -shared -std=c++17 calibration_tpu/native/dataset_codec.cpp \
	  -o calibration_tpu/native/_dataset_codec.so

clean:
	rm -f calibration_tpu/native/_dataset_codec.so
	find . -name __pycache__ -type d -exec rm -rf {} +
