"""Huffman codec: host oracle round-trips, device/host bit-exactness,
all arities, shared-table mode, and compression-size sanity."""

import numpy as np
import pytest

from data_compression_tpu import compress, decompress
from data_compression_tpu.config import CodecConfig
from data_compression_tpu.huffman.canonical import lengths_to_codes
from data_compression_tpu.models.huffman import (
    capped_lengths,
    decode_chunk_np,
    encode_chunk_np,
)
from tests.conftest import ascii_text


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_chunk_np_roundtrip(arity, rng):
    data = np.frombuffer(ascii_text(rng, 2000), np.uint8)
    freqs = np.bincount(data, minlength=256)
    table = lengths_to_codes(capped_lengths(freqs, arity), arity)
    payload = encode_chunk_np(data, table)
    back = decode_chunk_np(payload, len(data), table)
    assert (back == data).all()


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_device_matches_host_chunks(arity, rng):
    """Device encode must be byte-identical to the numpy oracle and
    device decode must invert it."""
    import jax.numpy as jnp

    from data_compression_tpu.huffman.canonical import build_decode_tables
    from data_compression_tpu.config import ARITY_MAX_LEN
    from data_compression_tpu.ops.huffman_coding import (
        decode_chunks,
        encode_chunks,
    )

    C = 256
    nchunks = 6
    data = np.frombuffer(ascii_text(rng, C * nchunks), np.uint8).reshape(nchunks, C)
    counts = np.full(nchunks, C, np.int32)
    counts[-1] = C - 100  # ragged final chunk

    # two different tables, alternating chunks
    freq_a = np.bincount(data[::2].reshape(-1), minlength=256)
    freq_b = np.bincount(data[1::2].reshape(-1), minlength=256) + 1
    tables = [
        lengths_to_codes(capped_lengths(freq_a, arity), arity),
        lengths_to_codes(capped_lengths(freq_b, arity), arity),
    ]
    tbl_of_chunk = np.arange(nchunks, dtype=np.int32) % 2

    packed, nbytes, ndigits = encode_chunks(
        jnp.asarray(data),
        jnp.asarray(counts),
        jnp.asarray(np.stack([t.codes for t in tables]).astype(np.int32)),
        jnp.asarray(np.stack([t.lengths for t in tables]).astype(np.int32)),
        jnp.asarray(tbl_of_chunk),
        arity=arity,
        chunk_syms=C,
    )
    packed, nbytes = np.asarray(packed), np.asarray(nbytes)

    for k in range(nchunks):
        t = tables[k % 2]
        expect = encode_chunk_np(data[k, : counts[k]], t)
        got = packed[k, : nbytes[k]].tobytes()
        assert got == expect, f"chunk {k} (arity {arity}) differs from oracle"

    dec = [build_decode_tables(t, pad_to=ARITY_MAX_LEN[arity]) for t in tables]
    syms = decode_chunks(
        jnp.asarray(packed),
        jnp.asarray(counts),
        jnp.asarray(np.stack([d["limit_scaled"] for d in dec]).astype(np.int32)),
        jnp.asarray(np.stack([d["base_minus_first"] for d in dec]).astype(np.int32)),
        jnp.asarray(np.stack([d["symbols"] for d in dec]).astype(np.int32)),
        jnp.asarray(tbl_of_chunk),
        arity=arity,
        chunk_syms=C,
    )
    syms = np.asarray(syms)
    for k in range(nchunks):
        assert (syms[k, : counts[k]] == data[k, : counts[k]]).all()


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_api_roundtrip_host(arity, rng):
    data = ascii_text(rng, 10 * 1024)
    cfg = CodecConfig(
        codec="huffman", arity=arity, block_size=4096, chunk_syms=512, use_device=False
    )
    out = compress(data, cfg)
    assert decompress(out, CodecConfig(chunk_syms=512, use_device=False)) == data
    assert len(out) < len(data)


@pytest.mark.parametrize("arity", [2, 16])
def test_api_roundtrip_device(arity, rng):
    data = ascii_text(rng, 32 * 1024)
    cfg = CodecConfig(codec="huffman", arity=arity, block_size=8192, chunk_syms=1024)
    out = compress(data, cfg)
    assert decompress(out, CodecConfig(chunk_syms=1024)) == data
    assert len(out) < len(data)


def test_host_device_streams_identical(rng):
    data = ascii_text(rng, 16 * 1024)
    cfg_d = CodecConfig(codec="huffman", arity=2, block_size=4096, chunk_syms=512)
    cfg_h = CodecConfig(
        codec="huffman", arity=2, block_size=4096, chunk_syms=512, use_device=False
    )
    assert compress(data, cfg_d) == compress(data, cfg_h)


def test_shared_table_mode(rng):
    data = ascii_text(rng, 16 * 1024)
    cfg = CodecConfig(
        codec="huffman", arity=2, block_size=4096, chunk_syms=512, shared_table=True
    )
    out = compress(data, cfg)
    assert decompress(out, CodecConfig(chunk_syms=512)) == data
    # shared mode saves the per-block 256-byte tables
    per_block = compress(data, CodecConfig(codec="huffman", arity=2, block_size=4096, chunk_syms=512))
    assert len(out) < len(per_block)


def test_binary_data_roundtrip(rng):
    # all 256 byte values (the reference cannot do this: NUL asserts at
    # n_ary_huffman.c:876, 8-bit warning at :486)
    data = bytes(rng.integers(0, 256, size=8 * 1024, dtype=np.uint8))
    cfg = CodecConfig(codec="huffman", arity=2, block_size=4096, chunk_syms=512)
    out = compress(data, cfg)
    assert decompress(out, CodecConfig(chunk_syms=512)) == data


def test_empty_and_tiny_inputs():
    for data in [b"", b"x", b"ab", b"aaaaaaaa"]:
        cfg = CodecConfig(codec="huffman", arity=2, block_size=1024, chunk_syms=256)
        out = compress(data, cfg)
        assert decompress(out) == data


def test_skewed_distribution_compresses_well(rng):
    data = bytes(
        rng.choice(
            np.frombuffer(b"aaaaaaaaaaaaaaaab", np.uint8), size=16 * 1024
        )
    )
    cfg = CodecConfig(codec="huffman", arity=2, block_size=16384, chunk_syms=1024)
    out = compress(data, cfg)
    assert decompress(out, CodecConfig(chunk_syms=1024)) == data
    assert len(out) < len(data) // 2
