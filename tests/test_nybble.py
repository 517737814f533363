"""Nybble codec: host round-trips, host/device cross-checks, and the
reference's canned-text behavior (nybble_compression.c:1150-1162)."""

import numpy as np
import pytest

from data_compression_tpu import compress, decompress
from data_compression_tpu.config import CodecConfig
from data_compression_tpu.models.nybble import decode_host, encode_host

REF_TEXT = (
    b"Hello, world. "
    b"This is a test. "
    b"This is only a test. "
    b"Banana banana banana banana. "
)


def test_reference_canned_text_roundtrip_and_size():
    comp = encode_host(REF_TEXT)
    # The reference asserts its compressed form is <= 70 bytes
    # (nybble_compression.c:1178); ours is the same stream.
    assert len(comp) <= 70
    assert decode_host(comp, len(REF_TEXT)) == REF_TEXT


def test_known_small_stream():
    # "aaaa": first byte verbatim; each following 'a' is a miss until
    # MTF inserts it, then hits at position 0 -> nybble 0x8.
    comp = encode_host(b"aaaa")
    dec = decode_host(comp, 4)
    assert dec == b"aaaa"
    assert comp[0] == 0xAF and comp[1] == ord("a")


def test_host_roundtrip_random_ascii(text_1k):
    comp = encode_host(text_1k)
    assert decode_host(comp, len(text_1k)) == text_1k


def test_static_table_mode():
    comp = encode_host(REF_TEXT, modify=False)
    assert decode_host(comp, len(REF_TEXT), modify=False) == REF_TEXT


def test_rejects_high_bytes():
    with pytest.raises(ValueError):
        encode_host(b"a\x80b")


@pytest.mark.parametrize("nblocks", [2, 5])
def test_device_matches_host(rng, nblocks):
    from data_compression_tpu.ops.scan_codecs import (
        nybble_decode_blocks,
        nybble_encode_blocks,
    )

    S = 512
    letters = np.frombuffer(b" eetaoinshrdlcu.,\n", np.uint8)
    blocks = rng.choice(letters, size=(nblocks, S)).astype(np.uint8)
    lengths = np.full(nblocks, S, np.int64)
    lengths[-1] = S - 37  # ragged final block

    dev = nybble_encode_blocks(blocks, lengths)
    host = [
        encode_host(blocks[i, : int(lengths[i])].tobytes()) for i in range(nblocks)
    ]
    assert dev == host, "device encode must be bit-exact with host"

    back = nybble_decode_blocks(dev, [int(x) for x in lengths])
    for i in range(nblocks):
        assert back[i] == blocks[i, : int(lengths[i])].tobytes()


def test_api_roundtrip(text_1k, rng):
    from tests.conftest import ascii_text

    data = ascii_text(rng, 20 * 1024)
    cfg = CodecConfig(codec="nybble", block_size=4096, chunk_syms=1024)
    out = compress(data, cfg)
    assert decompress(out) == data
    assert len(out) < len(data)  # this corpus must compress


def test_api_roundtrip_incompressible(rng):
    data = rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()
    cfg = CodecConfig(codec="nybble", block_size=4096, chunk_syms=1024)
    out = compress(data, cfg)  # blocks have high bytes -> literal fallback
    assert decompress(out) == data
