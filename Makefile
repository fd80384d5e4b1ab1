# Build / test / bench entry points (the reference's whole build system is a
# 4-line nvcc Makefile; ours builds the native host runtime and drives the
# Python framework).

NATIVE_DIR := raytracer_tpu/runtime/native
NATIVE_LIB := $(NATIVE_DIR)/libraytracer_host.so

.PHONY: all native test bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_DIR)/host_runtime.cpp
	g++ -O2 -shared -fPIC -std=c++17 $< -o $@

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d -exec rm -rf {} +
