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

# sanitizer build of the native library (the reference is single-file C
# with no sanitizer hooks; SURVEY.md §5 carries the lint intent of its
# Makefile:18-21 into an ASan/UBSan build for the C oracle)
native-asan:
	$(CC) -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer \
	  -shared -fPIC -Wall -Wextra \
	  -o data_compression_tpu/native/libdctpu_asan.so $(NATIVE_SRC)

# run the native parity tests against the sanitizer build
test-asan: native-asan
	DCTPU_NATIVE_LIB=data_compression_tpu/native/libdctpu_asan.so \
	LD_PRELOAD=$$($(CC) -print-file-name=libasan.so) \
	ASAN_OPTIONS=detect_leaks=0 \
	$(PY) -m pytest tests/test_native.py -x -q

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
