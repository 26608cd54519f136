# qampy_tpu build targets (parity role: reference Makefile:6-33)

CC ?= gcc
CFLAGS ?= -O3 -fPIC -shared -Wall

.PHONY: all native test bench docs clean sdist wheel

all: native

native: qampy_tpu/native/libqampy_native.so

qampy_tpu/native/libqampy_native.so: qampy_tpu/native/prbs.c
	$(CC) $(CFLAGS) -o $@ $<

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# API reference from docstrings (parity role: reference Makefile:24-27 docs)
docs:
	python tools/gendocs.py

sdist:
	python -m build --sdist

wheel:
	python -m build --wheel

clean:
	rm -f qampy_tpu/native/libqampy_native.so
	rm -rf build dist *.egg-info
