"""Pallas decode kernel (interpret mode) must invert the encoders."""

import numpy as np

from data_compression_tpu.huffman.canonical import lengths_to_codes
from data_compression_tpu.models.huffman import capped_lengths, encode_chunk_np
from tests.conftest import ascii_text


def test_pallas_decode_matches_oracle(rng):
    from data_compression_tpu.ops.pallas.decode_kernel import (
        C,
        LANES,
        decode_blocks_pallas,
    )

    B = 2
    S = C * LANES
    data = np.frombuffer(ascii_text(rng, B * S), np.uint8).reshape(B, S).copy()
    raw_lens = [S, S - 23456]
    data[1, raw_lens[1] :] = 0

    tables = []
    chunks_by_block = []
    for b in range(B):
        freqs = np.bincount(data[b, : raw_lens[b]], minlength=256)
        t = lengths_to_codes(capped_lengths(freqs, 2), 2)
        tables.append(t)
        chunks = []
        nc = max(1, -(-raw_lens[b] // C))
        for c in range(nc):
            cnt = max(0, min(C, raw_lens[b] - c * C))
            chunks.append(encode_chunk_np(data[b, c * C : c * C + cnt], t))
        chunks_by_block.append(chunks)

    out = decode_blocks_pallas(chunks_by_block, raw_lens, tables, interpret=True)
    for b in range(B):
        assert out[b] == data[b, : raw_lens[b]].tobytes(), f"block {b}"
