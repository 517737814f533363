"""Native C runtime: bit-exactness vs the Python reference paths."""

import numpy as np
import pytest

from data_compression_tpu import native
from data_compression_tpu.models.nybble import decode_host, encode_host
from data_compression_tpu.models.small import (
    small_byte_decode_host,
    small_byte_encode_host,
)
from data_compression_tpu.utils.crc import crc32
from tests.conftest import ascii_text


@pytest.fixture(scope="module")
def lib():
    if native.load() is None:
        pytest.skip("native library unavailable")
    return native


def test_crc32_matches_zlib(lib, rng):
    for size in [0, 1, 3, 100, 4097]:
        data = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        assert lib.crc32(data) == crc32(data)


def test_nybble_encode_matches_python(lib, rng):
    for size in [0, 1, 2, 500, 20000]:
        data = ascii_text(rng, size) if size else b""
        assert lib.nybble_encode(data) == encode_host(data)


def test_nybble_decode_matches_python(lib, rng):
    data = ascii_text(rng, 5000)
    payload = encode_host(data)
    assert lib.nybble_decode(payload, len(data)) == decode_host(payload, len(data))
    assert lib.nybble_decode(payload, len(data)) == data


def test_small_byte_matches_python(lib, rng):
    for size in [0, 1, 300, 5000]:
        data = ascii_text(rng, size) if size else b""
        cn = lib.small_byte_encode(data)
        cp = small_byte_encode_host(data)
        assert cn == cp
        if size:
            assert lib.small_byte_decode(cn, size) == data
            assert small_byte_decode_host(cn, size) == data


def test_small_byte_wraparound_native(lib, rng):
    data = bytes(rng.integers(1, 127, size=8000, dtype=np.uint8))
    cn = lib.small_byte_encode(data)
    assert cn == small_byte_encode_host(data)
    assert lib.small_byte_decode(cn, len(data)) == data


def test_native_huffman_chunk_roundtrip(lib, rng):
    import ctypes

    from data_compression_tpu.config import ARITY_MAX_LEN
    from data_compression_tpu.huffman.canonical import (
        build_decode_tables,
        lengths_to_codes,
    )
    from data_compression_tpu.models.huffman import capped_lengths, encode_chunk_np
    from data_compression_tpu.ops.encode_fast import pack_encode_table

    clib = native.load()
    data = np.frombuffer(ascii_text(rng, 2048), np.uint8)
    for arity in (2, 3, 16):
        freqs = np.bincount(data, minlength=256)
        t = lengths_to_codes(capped_lengths(freqs, arity), arity)
        pt, bt = pack_encode_table(t)
        cap = 4 * len(data) + 64
        out = (ctypes.c_uint8 * cap)()
        n = clib.dct_huffman_encode_chunk(
            (ctypes.c_uint8 * len(data)).from_buffer_copy(data.tobytes()),
            len(data),
            arity,
            pt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            bt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out,
            cap,
        )
        assert n > 0
        payload = bytes(out[:n])
        assert payload == encode_chunk_np(data, t), f"arity {arity}"

        L = ARITY_MAX_LEN[arity]
        d = build_decode_tables(t, pad_to=L)
        limit = np.ascontiguousarray(d["limit_scaled"], np.int64)
        bmf = np.ascontiguousarray(d["base_minus_first"], np.int64)
        symbols = np.ascontiguousarray(d["symbols"], np.int32)
        dec = (ctypes.c_uint8 * len(data))()
        m = clib.dct_huffman_decode_chunk(
            (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload),
            len(payload),
            len(data),
            arity,
            L,
            limit.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            bmf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dec,
        )
        assert m == len(data)
        assert bytes(dec[:]) == data.tobytes(), f"arity {arity} decode"


def test_small_nybble_matches_python(lib, rng):
    from data_compression_tpu.models.small import (
        small_nybble_decode_host,
        small_nybble_encode_host,
    )

    for size in [0, 1, 300, 3000]:
        data = ascii_text(rng, size) if size else b""
        cn = lib.small_nybble_encode(data)
        cp = small_nybble_encode_host(data)
        assert cn == cp, f"size {size}"
        if size:
            assert lib.small_nybble_decode(cn, size) == data
            assert small_nybble_decode_host(cn, size) == data


def test_small_nybble_native_full_byte_range(lib, rng):
    """Unlike small_byte, the nybble scheme takes ALL byte values; the
    8000-byte run exercises slot wrap-around (0x100 -> 0x80)."""
    data = bytes(rng.integers(0, 256, size=8000, dtype=np.uint8))
    cn = lib.small_nybble_encode(data)
    assert lib.small_nybble_decode(cn, len(data)) == data
