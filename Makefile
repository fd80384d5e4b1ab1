# Build / test / bench entry points (the reference's whole build system is a
# 4-line nvcc Makefile; ours builds the native host runtime and drives the
# Python framework).

NATIVE_DIR := raytracer_tpu/runtime/native
NATIVE_LIB := $(NATIVE_DIR)/libraytracer_host.so

.PHONY: all native test test-tpu bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_DIR)/host_runtime.cpp
	g++ -O2 -shared -fPIC -std=c++17 $< -o $@

test: native
	python -m pytest tests/ -q

# Full suite against real TPU hardware: compiles the actual Mosaic kernels
# (the default suite runs the Pallas interpreter on a virtual CPU mesh) and
# enables the megakernel tests, incl. mega-vs-regen agreement per scene.
# One TPU process at a time; the compilation cache makes re-runs fast.
test-tpu: native
	JAX_COMPILATION_CACHE_DIR=$${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache} \
	RAYTRACER_TEST_TPU=1 python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d -exec rm -rf {} +
