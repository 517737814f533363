"""Pallas decode kernel (interpret mode) must invert the encoders."""

import numpy as np
import pytest

from data_compression_tpu.huffman.canonical import lengths_to_codes
from data_compression_tpu.models.huffman import capped_lengths, encode_chunk_np
from tests.conftest import ascii_text


def _roundtrip(rng, C, raw_lens, arity=2):
    from data_compression_tpu.ops.pallas.decode_kernel import (
        LANES,
        decode_blocks_pallas,
    )

    B = len(raw_lens)
    S = C * LANES
    data = np.frombuffer(ascii_text(rng, B * S), np.uint8).reshape(B, S).copy()
    for b, rl in enumerate(raw_lens):
        data[b, rl:] = 0

    tables = []
    chunks_by_block = []
    for b in range(B):
        freqs = np.bincount(data[b, : raw_lens[b]], minlength=256)
        t = lengths_to_codes(capped_lengths(freqs, arity), arity)
        tables.append(t)
        chunks = []
        nc = max(1, -(-raw_lens[b] // C))
        for c in range(nc):
            cnt = max(0, min(C, raw_lens[b] - c * C))
            chunks.append(encode_chunk_np(data[b, c * C : c * C + cnt], t))
        chunks_by_block.append(chunks)

    out = decode_blocks_pallas(
        chunks_by_block, raw_lens, tables, interpret=True, chunk_syms=C,
        arity=arity,
    )
    for b in range(B):
        assert out[b] == data[b, : raw_lens[b]].tobytes(), f"block {b}"


def test_pallas_decode_matches_oracle(rng):
    from data_compression_tpu.ops.pallas.decode_kernel import C, LANES

    S = C * LANES
    _roundtrip(rng, C, [S, S - 23456])


def test_pallas_decode_small_blocks(rng):
    """16 KiB blocks (C=128): geometry below one SEG of output."""
    from data_compression_tpu.ops.pallas.decode_kernel import LANES

    _roundtrip(rng, 128, [128 * LANES, 128 * LANES - 777])


def test_pallas_decode_large_blocks(rng):
    """128 KiB blocks (C=1024): per-segment merge result is narrower
    than the block accumulator (exercises the pad-before-fold path).
    Short raw_len keeps interpret-mode segment count small."""
    _roundtrip(rng, 1024, [5 * 1024 + 321])


def test_pallas_decode_arity16(rng):
    """Nybble-digit decode (4-bit fields, L=7): digit-reversed packing,
    funnel windows, and rank shifts generalized over the field width."""
    from data_compression_tpu.ops.pallas.decode_kernel import LANES

    _roundtrip(rng, 128, [128 * LANES, 4321], arity=16)


def test_pallas_decode_arity3(rng):
    """Trinary decode (2-bit trit fields, base-243 wire): pattern-gather
    word fill and value-space windows via 4-field table gathers —
    trinary is the reference driver's own default config
    (n_ary_huffman.c:2529)."""
    from data_compression_tpu.ops.pallas.decode_kernel import LANES

    _roundtrip(rng, 128, [128 * LANES, 4321], arity=3)


def test_seg_bucket_geometry():
    # payload geometry buckets: smallest allowed cap >= requirement,
    # n=3 rounds to whole 80-trit packing groups, never exceeds the
    # worst-case capacity
    from data_compression_tpu.ops.pallas.decode_kernel import (
        SEG,
        _geom,
        seg_bucket,
    )

    for arity in (2, 3, 16):
        cap, capp, mbp_cap, _, _ = _geom(512, arity)
        cap_segs = capp // SEG
        for req in (1, 2, 5, 7, cap_segs, cap_segs + 10):
            b = seg_bucket(512, arity, req)
            assert b <= cap_segs
            if req <= cap_segs:
                assert b >= min(req, cap_segs)
            _, capp_b, mbp_b, _, _ = _geom(512, arity, b)
            assert mbp_b <= mbp_cap
            if arity == 3:
                # 80-trit groups: byte count must divide evenly
                assert (capp_b * 2) % 32 == 0 and capp_b % 5 == 0
    # requirement within capacity is always satisfied by the bucket
    assert seg_bucket(512, 2, 7) >= 7
    _, capp7, mbp7, _, _ = _geom(512, 2, seg_bucket(512, 2, 7))
    assert mbp7 * 8 >= 7 * SEG
