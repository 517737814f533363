"""Generic n-ary Huffman (host path): the reference's huffman() is
generic over compressed_symbols and its tests exercise 9- and 10-ary
(n_ary_huffman.c:1161-1208, trinary driver :2541).  Arities outside
the bit-field fast set (2/3/16) ride the digit-generic numpy path with
computed per-arity wire packing (config._digits_per_byte) and length
caps (config._arity_cap)."""

import numpy as np
import pytest

from data_compression_tpu import CodecConfig, compress, decompress
from data_compression_tpu.config import ARITY_DIGITS_PER_BYTE, ARITY_MAX_LEN
from data_compression_tpu.huffman.canonical import lengths_to_codes
from data_compression_tpu.models.huffman import (
    capped_lengths,
    decode_chunk_np,
    encode_chunk_np,
)
from tests.conftest import ascii_text


def test_computed_tables_match_hand_derived():
    # the round-1 hand-derived values must be reproduced exactly
    assert ARITY_MAX_LEN[2] == 15 and ARITY_DIGITS_PER_BYTE[2] == 8
    assert ARITY_MAX_LEN[3] == 15 and ARITY_DIGITS_PER_BYTE[3] == 5
    assert ARITY_MAX_LEN[16] == 7 and ARITY_DIGITS_PER_BYTE[16] == 2
    # int32 safety + byte-fit invariants for every supported arity
    for n, cap in ARITY_MAX_LEN.items():
        assert n**cap < 2**31
        d = ARITY_DIGITS_PER_BYTE[n]
        assert n**d <= 256 and (d == 1 or n ** (d + 1) > 256)


@pytest.mark.parametrize("arity", [4, 5, 9, 10, 37, 64])
def test_generic_arity_chunk_roundtrip(rng, arity):
    data = np.frombuffer(ascii_text(rng, 3000), np.uint8)
    freqs = np.bincount(data, minlength=256)
    t = lengths_to_codes(capped_lengths(freqs, arity), arity)
    payload = encode_chunk_np(data, t)
    out = decode_chunk_np(payload, data.size, t)
    assert np.array_equal(out, data)


@pytest.mark.parametrize("arity", [9, 10])
def test_generic_arity_api_roundtrip(rng, arity):
    data = ascii_text(rng, 150_000)
    cfg = CodecConfig(codec="huffman", arity=arity, use_device=False)
    blob = compress(data, cfg)
    assert decompress(blob, cfg) == data
    # the frame records the arity; decode without a config works too
    assert decompress(blob) == data


@pytest.mark.parametrize("arity", [9, 10])
def test_generic_arity_device_config_falls_back_to_host(rng, arity):
    """use_device=True must still produce correct streams for generic
    arities (routed to the host path, not an error)."""
    data = ascii_text(rng, 70_000)
    cfg = CodecConfig(codec="huffman", arity=arity, use_device=True)
    blob = compress(data, cfg)
    assert decompress(blob, cfg) == data


def test_arity_bounds_validation():
    with pytest.raises(ValueError):
        CodecConfig(codec="huffman", arity=1)
    with pytest.raises(ValueError):
        CodecConfig(codec="huffman", arity=65)
