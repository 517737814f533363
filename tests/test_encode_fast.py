"""encode_fast must be wire-identical to the v1 encoder / numpy oracle."""

import numpy as np
import pytest

from data_compression_tpu.huffman.canonical import lengths_to_codes
from data_compression_tpu.models.huffman import capped_lengths, encode_chunk_np
from tests.conftest import ascii_text


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_fast_matches_oracle(arity, rng):
    import jax.numpy as jnp

    from data_compression_tpu.ops.encode_fast import (
        encode_chunks_fast,
        pack_encode_table,
    )

    C = 256
    nchunks = 8
    data = np.frombuffer(ascii_text(rng, C * nchunks), np.uint8).reshape(nchunks, C)
    counts = np.full(nchunks, C, np.int32)
    counts[-1] = C - 77

    freq_a = np.bincount(data[::2].reshape(-1), minlength=256)
    freq_b = np.bincount(data[1::2].reshape(-1), minlength=256) + 1
    tables = [
        lengths_to_codes(capped_lengths(freq_a, arity), arity),
        lengths_to_codes(capped_lengths(freq_b, arity), arity),
    ]
    tbl_of_chunk = np.arange(nchunks, dtype=np.int32) % 2

    packed_tabs, bits_tabs = zip(*[pack_encode_table(t) for t in tables])
    out, nbytes, ndigits = encode_chunks_fast(
        jnp.asarray(data),
        jnp.asarray(counts),
        jnp.asarray(np.stack(packed_tabs)),
        jnp.asarray(np.stack(bits_tabs)),
        jnp.asarray(tbl_of_chunk),
        arity=arity,
        chunk_syms=C,
    )
    out, nbytes = np.asarray(out), np.asarray(nbytes)
    for k in range(nchunks):
        expect = encode_chunk_np(data[k, : counts[k]], tables[k % 2])
        got = out[k, : nbytes[k]].tobytes()
        assert got == expect, f"chunk {k} arity {arity}: fast encoder differs"


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_fast_matches_v1(arity, rng):
    import jax.numpy as jnp

    from data_compression_tpu.ops.encode_fast import (
        encode_chunks_fast,
        pack_encode_table,
    )
    from data_compression_tpu.ops.huffman_coding import encode_chunks

    C = 512
    nchunks = 4
    data = np.frombuffer(ascii_text(rng, C * nchunks), np.uint8).reshape(nchunks, C)
    counts = np.full(nchunks, C, np.int32)
    freqs = np.bincount(data.reshape(-1), minlength=256)
    t = lengths_to_codes(capped_lengths(freqs, arity), arity)
    tbl = np.zeros(nchunks, np.int32)

    p1, n1, d1 = encode_chunks(
        jnp.asarray(data),
        jnp.asarray(counts),
        jnp.asarray(t.codes[None].astype(np.int32)),
        jnp.asarray(t.lengths[None].astype(np.int32)),
        jnp.asarray(tbl),
        arity=arity,
        chunk_syms=C,
    )
    pt, bt = pack_encode_table(t)
    p2, n2, d2 = encode_chunks_fast(
        jnp.asarray(data),
        jnp.asarray(counts),
        jnp.asarray(pt[None]),
        jnp.asarray(bt[None]),
        jnp.asarray(tbl),
        arity=arity,
        chunk_syms=C,
    )
    assert (np.asarray(n1) == np.asarray(n2)).all()
    assert (np.asarray(d1) == np.asarray(d2)).all()
    for k in range(nchunks):
        nb = int(np.asarray(n1)[k])
        assert np.asarray(p1)[k, :nb].tobytes() == np.asarray(p2)[k, :nb].tobytes()
