# data_compression_tpu build/test/bench driver.
# (Reference analogue: /root/reference/Makefile's build + time_test
# harness; here `make bench` is the GB/s benchmark on the chip and
# `make test` the pytest suite.)

PY ?= python
CC ?= cc
CFLAGS ?= -O3 -march=native -shared -fPIC -Wall -Wextra

NATIVE_SRC := data_compression_tpu/native/libdctpu.c
NATIVE_SO  := data_compression_tpu/native/libdctpu.so

.PHONY: all native test test-fast bench clean oracle

all: native

native: $(NATIVE_SO)

$(NATIVE_SO): $(NATIVE_SRC)
	$(CC) $(CFLAGS) -o $@ $<

test: native
	$(PY) -m pytest tests/ -x -q

test-fast: native
	$(PY) -m pytest tests/ -x -q -k "not parallel and not pallas"

bench: native
	$(PY) bench.py

# differential-parity harness against the read-only reference mount
oracle:
	mkdir -p build
	gcc -std=c17 -O1 -o build/nybble_harness tests/oracle/nybble_harness.c

clean:
	rm -f $(NATIVE_SO)
	rm -rf build data_compression_tpu/**/__pycache__
