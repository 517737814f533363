"""decode_chunks_fast must invert the encoder bit-exactly, matching the
scan decoder."""

import numpy as np
import pytest

from data_compression_tpu.config import ARITY_MAX_LEN
from data_compression_tpu.huffman.canonical import (
    build_decode_tables,
    lengths_to_codes,
)
from data_compression_tpu.models.huffman import capped_lengths, encode_chunk_np
from tests.conftest import ascii_text


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_decode_fast_roundtrip(arity, rng):
    import jax.numpy as jnp

    from data_compression_tpu.ops.decode_fast import decode_chunks_fast
    from data_compression_tpu.ops.huffman_coding import max_chunk_bytes

    C = 256
    nchunks = 6
    data = np.frombuffer(ascii_text(rng, C * nchunks), np.uint8).reshape(nchunks, C)
    counts = np.full(nchunks, C, np.int32)
    counts[-1] = C - 100

    freq_a = np.bincount(data[::2].reshape(-1), minlength=256)
    freq_b = np.bincount(data[1::2].reshape(-1), minlength=256) + 1
    tables = [
        lengths_to_codes(capped_lengths(freq_a, arity), arity),
        lengths_to_codes(capped_lengths(freq_b, arity), arity),
    ]
    tbl_of_chunk = np.arange(nchunks, dtype=np.int32) % 2

    mb = max_chunk_bytes(C, arity)
    payload = np.zeros((nchunks, mb), np.uint8)
    for k in range(nchunks):
        enc = encode_chunk_np(data[k, : counts[k]], tables[k % 2])
        payload[k, : len(enc)] = np.frombuffer(enc, np.uint8)

    dec = [build_decode_tables(t, pad_to=ARITY_MAX_LEN[arity]) for t in tables]
    out = decode_chunks_fast(
        jnp.asarray(payload),
        jnp.asarray(counts),
        jnp.asarray(np.stack([d["limit_scaled"] for d in dec]).astype(np.int32)),
        jnp.asarray(np.stack([d["base_minus_first"] for d in dec]).astype(np.int32)),
        jnp.asarray(np.stack([d["symbols"] for d in dec]).astype(np.int32)),
        jnp.asarray(tbl_of_chunk),
        arity=arity,
        chunk_syms=C,
    )
    out = np.asarray(out)
    for k in range(nchunks):
        assert (out[k, : counts[k]] == data[k, : counts[k]]).all(), (
            f"arity {arity} chunk {k}"
        )


def test_decode_fast_single_symbol_table(rng):
    import jax.numpy as jnp

    from data_compression_tpu.ops.decode_fast import decode_chunks_fast
    from data_compression_tpu.ops.huffman_coding import max_chunk_bytes

    C = 128
    data = np.full((2, C), 65, np.uint8)
    freqs = np.zeros(256, np.int64)
    freqs[65] = 100
    t = lengths_to_codes(capped_lengths(freqs, 2), 2)
    payload = np.zeros((2, max_chunk_bytes(C, 2)), np.uint8)
    for k in range(2):
        enc = encode_chunk_np(data[k], t)
        payload[k, : len(enc)] = np.frombuffer(enc, np.uint8)
    d = build_decode_tables(t, pad_to=ARITY_MAX_LEN[2])
    out = decode_chunks_fast(
        jnp.asarray(payload),
        jnp.asarray(np.full(2, C, np.int32)),
        jnp.asarray(d["limit_scaled"][None].astype(np.int32)),
        jnp.asarray(d["base_minus_first"][None].astype(np.int32)),
        jnp.asarray(d["symbols"][None].astype(np.int32)),
        jnp.asarray(np.zeros(2, np.int32)),
        arity=2,
        chunk_syms=C,
    )
    assert (np.asarray(out) == 65).all()
