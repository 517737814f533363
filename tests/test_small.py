"""small (context-LZW) codecs: round-trips plus decoder parity with the
reference's mock-encoder streams (small_compression.c:668-754)."""

import numpy as np
import pytest

from data_compression_tpu import compress, decompress
from data_compression_tpu.config import CodecConfig
from tests.conftest import ascii_text
from data_compression_tpu.models.small import (
    EIGHT_BIT_PRUNED,
    small_byte_decode_host,
    small_byte_encode_host,
    small_nybble_decode_host,
    small_nybble_encode_host,
)

REF_TEXT = (
    b"Hello, world. "
    b"This is a test. "
    b"This is only a test. "
    b"Banana banana banana banana. "
)


def _mock_byte_stream(text: bytes) -> bytes:
    """Replicate test_compress_bytestring (small_compression.c:688-729):
    hard-wired dictionary — ' '+lowercase pairs -> 0x80+letter, all else
    literal."""
    out = bytearray([EIGHT_BIT_PRUNED, text[0]])
    i = 1
    while i < len(text):
        if (
            text[i] == ord(" ")
            and i + 1 < len(text)
            and ord("a") <= text[i + 1] <= ord("z")
        ):
            out.append(0x80 + text[i + 1])
            i += 2
        else:
            out.append(text[i])
            i += 1
    return bytes(out)


def test_decoder_parity_with_reference_mock_stream():
    # The reference decodes its mock stream back to the canned text
    # ("Successful test", small_compression.c:1795-1803). Our decoder
    # must agree on the same stream.
    stream = _mock_byte_stream(REF_TEXT)
    assert small_byte_decode_host(stream, len(REF_TEXT)) == REF_TEXT


def test_byte_roundtrip_canned():
    comp = small_byte_encode_host(REF_TEXT)
    assert small_byte_decode_host(comp, len(REF_TEXT)) == REF_TEXT
    # the real encoder must beat the mock (it finds repeats of
    # "anana banana" etc.)
    assert len(comp) < len(REF_TEXT)


def test_byte_roundtrip_repetitive():
    text = b"the cat sat on the mat. " * 40
    comp = small_byte_encode_host(text)
    assert small_byte_decode_host(comp, len(text)) == text
    assert len(comp) < len(text) // 2


def test_byte_roundtrip_random_ascii(text_1k):
    comp = small_byte_encode_host(text_1k)
    assert small_byte_decode_host(comp, len(text_1k)) == text_1k


def test_byte_roundtrip_wraparound(rng):
    # enough novel digrams to wrap the 127-slot dictionaries
    data = bytes(rng.integers(1, 127, size=8000, dtype=np.uint8))
    comp = small_byte_encode_host(data)
    assert small_byte_decode_host(comp, len(data)) == data


def test_nybble_roundtrip_canned():
    comp = small_nybble_encode_host(REF_TEXT)
    assert small_nybble_decode_host(comp, len(REF_TEXT)) == REF_TEXT


def test_nybble_roundtrip_binary(rng):
    # scheme B handles arbitrary bytes (words are nybble strings)
    data = bytes(rng.integers(0, 256, size=3000, dtype=np.uint8))
    comp = small_nybble_encode_host(data)
    assert small_nybble_decode_host(comp, len(data)) == data


def test_nybble_roundtrip_repetitive():
    text = b"abcabcabcabc" * 50
    comp = small_nybble_encode_host(text)
    assert small_nybble_decode_host(comp, len(text)) == text
    assert len(comp) < len(text)


@pytest.mark.parametrize("codec", ["small_byte", "small_nybble"])
def test_api_roundtrip(codec, rng):
    from tests.conftest import ascii_text

    data = ascii_text(rng, 8 * 1024)
    cfg = CodecConfig(codec=codec, block_size=2048, chunk_syms=1024)
    out = compress(data, cfg)
    assert decompress(out) == data


def test_device_decode_matches_host(rng):
    from data_compression_tpu.ops.scan_codecs import small_byte_decode_blocks

    texts = [
        b"the cat sat on the mat. " * 30,
        bytes(rng.integers(1, 127, size=3000, dtype=np.uint8)),
        ascii_text(rng, 2000),
    ]
    payloads = [small_byte_encode_host(t) for t in texts]
    outs = small_byte_decode_blocks(payloads, [len(t) for t in texts])
    for o, t in zip(outs, texts):
        assert o == t


def test_frozen_semantics_wraparound_consistency(rng):
    # heavy wrap-around: dictionary slots recycle many times; frozen
    # spans + generation checks must stay encoder/decoder-consistent
    data = bytes(rng.integers(1, 32, size=20000, dtype=np.uint8))
    comp = small_byte_encode_host(data)
    assert small_byte_decode_host(comp, len(data)) == data


def test_nybble_device_decode_matches_host(rng):
    # scheme-B scan lane vs the host decoder, bit-exact (the
    # block-parallel strategy SURVEY §3.5 prescribes for
    # small_compression.c:1432-1483)
    from data_compression_tpu.ops.scan_codecs import small_nybble_decode_blocks

    texts = [
        b"the cat sat on the mat. " * 30,
        bytes(rng.integers(1, 250, size=3000, dtype=np.uint8)),
        ascii_text(rng, 2000),
        bytes(rng.integers(1, 16, size=6000, dtype=np.uint8)),  # slot wrap
    ]
    payloads = [small_nybble_encode_host(t) for t in texts]
    for p, t in zip(payloads, texts):  # host decoder agrees first
        assert small_nybble_decode_host(p, len(t)) == t
    outs = small_nybble_decode_blocks(payloads, [len(t) for t in texts])
    for o, t in zip(outs, texts):
        assert o == t


def test_nybble_use_scan_api_roundtrip(rng):
    data = ascii_text(rng, 8 * 1024)
    cfg = CodecConfig(codec="small_nybble", block_size=2048, chunk_syms=1024)
    out = compress(data, cfg)
    back = decompress(out, CodecConfig(use_scan=True))
    assert back == data


def test_isprint_mode_roundtrip(rng):
    # ISPRINT_IS_ALWAYS_LITERAL (0x1f): the reference enum's last
    # reserved mode (small_compression.c:36) — printable stream bytes
    # are literals, non-printable byte values index the dictionary
    from data_compression_tpu.models.small import (
        ISPRINT_LITERAL,
        small_isprint_decode_host,
        small_isprint_encode_host,
    )

    texts = [
        b"the cat sat on the mat. " * 40,
        ascii_text(rng, 4000).replace(b"\n", b" "),
        bytes(rng.integers(0x20, 0x7F, size=5000, dtype=np.uint8)),
    ]
    for t in texts:
        comp = small_isprint_encode_host(t)
        assert comp[0] == ISPRINT_LITERAL  # the mode byte round-trips
        assert small_isprint_decode_host(comp, len(t)) == t
    with pytest.raises(ValueError):
        small_isprint_encode_host(b"has\x01control")


def test_isprint_mode_api_mixed_blocks(rng):
    # printable blocks ride 0x1f, a block with control bytes stays on
    # scheme A — both in one frame, dispatch on the per-block type byte
    printable = bytes(rng.integers(0x20, 0x7F, size=2048, dtype=np.uint8))
    control = bytes(rng.integers(1, 127, size=2048, dtype=np.uint8))
    data = printable + control + printable
    cfg = CodecConfig(
        codec="small_byte", block_size=2048, chunk_syms=1024,
        isprint_literal=True,
    )
    out = compress(data, cfg)
    assert decompress(out) == data


def test_byte_device_encode_matches_host(rng):
    # scheme-A scan ENCODE lane vs the host encoder, bit-exact —
    # completes the device-path symmetry (decode lanes landed earlier)
    from data_compression_tpu.ops.scan_codecs import small_byte_encode_blocks

    texts = [
        b"the cat sat on the mat. " * 30,
        bytes(rng.integers(1, 127, size=2500, dtype=np.uint8)),
        bytes(rng.integers(1, 24, size=5000, dtype=np.uint8)),  # slot wrap
        ascii_text(rng, 2000),
    ]
    S = max(len(t) for t in texts)
    blocks = np.zeros((len(texts), S), np.uint8)
    lens = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        blocks[i, : len(t)] = np.frombuffer(t, np.uint8)
        lens[i] = len(t)
    got = small_byte_encode_blocks(blocks, lens)
    for g, t in zip(got, texts):
        assert g == small_byte_encode_host(t)
        assert small_byte_decode_host(g, len(t)) == t


def test_byte_use_scan_encode_api_roundtrip(rng):
    data = ascii_text(rng, 8 * 1024)
    cfg = CodecConfig(codec="small_byte", block_size=2048, chunk_syms=1024,
                      use_scan=True)
    out = compress(data, cfg)
    assert decompress(out) == data


def test_nybble_device_encode_matches_host(rng):
    # scheme-B scan ENCODE lane vs the host encoder, bit-exact — with
    # the decode lane, every serial codec now has device lanes in both
    # directions
    from data_compression_tpu.ops.scan_codecs import small_nybble_encode_blocks

    texts = [
        b"the cat sat on the mat. " * 30,
        bytes(rng.integers(1, 250, size=1500, dtype=np.uint8)),
        bytes(rng.integers(1, 16, size=4000, dtype=np.uint8)),  # slot wrap
    ]
    S = max(len(t) for t in texts)
    blocks = np.zeros((len(texts), S), np.uint8)
    lens = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        blocks[i, : len(t)] = np.frombuffer(t, np.uint8)
        lens[i] = len(t)
    got = small_nybble_encode_blocks(blocks, lens)
    for g, t in zip(got, texts):
        assert g == small_nybble_encode_host(t)
        assert small_nybble_decode_host(g, len(t)) == t
