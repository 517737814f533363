"""Canonical table parity with the reference's unit-test vectors
(n_ary_huffman.c:2821-2891) plus structural properties."""

import numpy as np
import pytest

from data_compression_tpu.huffman import (
    CanonicalTable,
    build_decode_tables,
    dummy_node_count,
    huffman_lengths,
    lengths_to_codes,
)


def test_reference_vector_trinary_three_symbols():
    # n_ary_huffman.c:2826-2843: lengths {0,0,1,1,1} in trinary ->
    # codes {_,_,0,1,2}.
    lengths = np.zeros(21, np.int32)
    lengths[2:5] = 1
    t = lengths_to_codes(lengths, arity=3)
    assert list(t.codes[2:5]) == [0, 1, 2]
    assert t.codes[:2].sum() == 0


def test_reference_vector_trinary_eight_symbols():
    # n_ary_huffman.c:2844-2865: 8 symbols of length 2 -> codes 0..7
    # (one unused dummy codeword, the all-twos code 8).
    lengths = np.zeros(21, np.int32)
    lengths[2:10] = 2
    t = lengths_to_codes(lengths, arity=3)
    assert list(t.codes[2:10]) == list(range(8))


def test_reference_vector_trinary_nine_symbols():
    # n_ary_huffman.c:2866-2889: 9 symbols of length 2 -> codes 0..8.
    lengths = np.zeros(21, np.int32)
    lengths[2:11] = 2
    t = lengths_to_codes(lengths, arity=3)
    assert list(t.codes[2:11]) == list(range(9))


def test_mixed_length_binary_canonical():
    # lengths: a=1, b=2, c=3, d=3  ->  0, 10, 110, 111
    lengths = np.array([1, 2, 3, 3], np.int32)
    t = lengths_to_codes(lengths, arity=2)
    assert list(t.codes) == [0b0, 0b10, 0b110, 0b111]
    # all-ones code is the longest (reference convention,
    # n_ary_huffman.c:1475-1483)
    assert t.codes[3] == (1 << 3) - 1


def test_dummy_node_count_fixed_formula():
    # The reference formula (without the final modulo) returns n-1
    # instead of 0 when (k-1) % (n-1) == 0 — the SIGABRT bug at
    # n_ary_huffman.c:916. Fixed behavior:
    assert dummy_node_count(3, 3) == 0  # odd count, trinary
    assert dummy_node_count(5, 3) == 0
    assert dummy_node_count(4, 3) == 1  # even count, trinary
    assert dummy_node_count(7, 2) == 0  # binary never needs dummies
    assert dummy_node_count(1, 10) == 0
    assert dummy_node_count(11, 10) == 8


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_lengths_kraft_and_optimality(arity):
    rng = np.random.default_rng(1)
    freqs = rng.integers(0, 1000, size=256)
    freqs[rng.integers(0, 256, size=50)] = 0
    lengths = huffman_lengths(freqs, arity)
    used = freqs > 0
    assert (lengths[used] > 0).all()
    assert (lengths[~used] == 0).all()
    # Kraft equality within dummy slack:
    kraft = (np.power(float(arity), -lengths[used].astype(np.float64))).sum()
    assert kraft <= 1.0 + 1e-9
    # shorter codes for more frequent symbols (weak monotonicity)
    f = freqs[used]
    l = lengths[used]
    order = np.argsort(-f, kind="stable")
    assert (np.diff(l[order]) >= 0).sum() >= len(order) - 1 - (f[order][:-1] == f[order][1:]).sum()


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_lengths_beat_fixed_width(arity):
    # Huffman payload must not exceed the uniform-code payload
    # (the comparison find_compressed_data_size makes,
    # n_ary_huffman.c:2466-2506).
    rng = np.random.default_rng(2)
    # skewed distribution
    freqs = (1000 / (1 + np.arange(100.0))).astype(np.int64)
    lengths = huffman_lengths(np.concatenate([freqs, np.zeros(156, np.int64)]), arity)
    payload = (freqs * lengths[:100]).sum()
    k = 100
    uniform_len = int(np.ceil(np.log(k) / np.log(arity)))
    assert payload <= freqs.sum() * uniform_len


def test_single_symbol_alphabet():
    freqs = np.zeros(256, np.int64)
    freqs[65] = 1000
    lengths = huffman_lengths(freqs, 2)
    assert lengths[65] == 1
    t = lengths_to_codes(lengths, 2)
    assert t.codes[65] == 0


def test_two_symbols_trinary_uses_dummy():
    freqs = np.zeros(256, np.int64)
    freqs[65] = 10
    freqs[66] = 1
    lengths = huffman_lengths(freqs, 3)
    assert lengths[65] == 1 and lengths[66] == 1  # dummy takes third slot


def test_decode_tables_invert_codes():
    rng = np.random.default_rng(3)
    for arity in (2, 3, 16):
        freqs = rng.integers(0, 500, size=256)
        lengths = huffman_lengths(freqs, arity)
        t = lengths_to_codes(lengths, arity)
        d = build_decode_tables(t)
        L = d["first_scaled"].shape[0] - 1
        for sym in np.flatnonzero(freqs)[:40]:
            ln = int(t.lengths[sym])
            code = int(t.codes[sym])
            # scale code into a full L-digit window with arbitrary tail
            window = code * arity ** (L - ln) + (arity ** (L - ln) - 1)
            # decoded length = smallest l with window < limit_scaled[l]
            lens = np.arange(1, L + 1)
            ok = window < d["limit_scaled"][1:]
            ge = window >= d["first_scaled"][1:]
            cand = lens[ok & ge]
            assert cand.size and cand[0] == ln
            idx = d["base_minus_first"][ln] + code
            assert d["symbols"][idx] == sym


def test_table_wire_roundtrip():
    rng = np.random.default_rng(4)
    freqs = rng.integers(0, 500, size=256)
    lengths = huffman_lengths(freqs, 3)
    t = lengths_to_codes(lengths, 3)
    t2 = CanonicalTable.from_bytes(t.to_bytes(), 3)
    assert (t2.codes == t.codes).all()
    assert (t2.lengths == t.lengths).all()
