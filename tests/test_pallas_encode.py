"""Pallas encode kernel (interpret mode on CPU) vs the XLA/numpy
encoders — must be wire-identical."""

import numpy as np
import pytest

from data_compression_tpu.huffman.canonical import lengths_to_codes
from data_compression_tpu.models.huffman import capped_lengths, encode_chunk_np
from tests.conftest import ascii_text


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_pallas_matches_oracle(arity, rng):
    from data_compression_tpu.ops.pallas.encode_kernel import (
        CHUNK_SYMS,
        LANES,
        encode_blocks_pallas,
    )

    B = 2
    S = CHUNK_SYMS * LANES
    data = np.frombuffer(ascii_text(rng, B * S), np.uint8).reshape(B, S).copy()
    raw_lens = np.array([S, S - 12345], np.int64)
    data[1, raw_lens[1] :] = 0

    tables = []
    for i in range(B):
        freqs = np.bincount(data[i, : raw_lens[i]], minlength=256)
        tables.append(lengths_to_codes(capped_lengths(freqs, arity), arity))

    out, nbytes, ndigits = encode_blocks_pallas(
        data, raw_lens, tables, arity, interpret=True
    )
    out, nbytes = np.asarray(out), np.asarray(nbytes)

    C = CHUNK_SYMS
    for b in range(B):
        for c in range(LANES):
            cnt = max(0, min(C, int(raw_lens[b]) - c * C))
            expect = encode_chunk_np(data[b, c * C : c * C + cnt], tables[b])
            k = b * LANES + c
            got = out[k, : nbytes[k]].tobytes()
            assert got == expect, f"arity {arity} block {b} chunk {c}"
            if cnt == 0:
                assert nbytes[k] == 0
