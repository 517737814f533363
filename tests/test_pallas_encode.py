"""Pallas encode kernel (interpret mode on CPU) vs the XLA/numpy
encoders — must be wire-identical."""

import numpy as np
import pytest

from data_compression_tpu.huffman.canonical import lengths_to_codes
from data_compression_tpu.models.huffman import capped_lengths, encode_chunk_np
from tests.conftest import ascii_text


def _skewed_block(rng, arity, size):
    """One block whose histogram forces deep Huffman codes.

    n=2: Fibonacci frequencies -> max_len 15 (top MAXLEN_BUCKET).
    n=3: tribonacci-style chain -> max_len 10.
    n=16: a x16-per-level chain (16^4 = 65536 = exactly one block)
    -> max_len 4, the smallest depth whose packed (code, bit-length)
    pair overflowed the old bit-count field (regression for the
    arity-16 truncation bug)."""
    if arity == 2:
        fib = [1, 1]
        for _ in range(14):
            fib.append(fib[-1] + fib[-2])
        w = np.array(fib, np.int64) * (size // sum(fib))
        w[-1] += size - w.sum()
    elif arity == 3:
        w = np.array([1, 1, 1] + [3**k for k in range(1, 10) for _ in range(2)],
                     np.int64)
        r = size - w.sum()
        w[-1] += r // 2
        w[-2] += r - r // 2
    else:
        w = np.array([1] * 16 + [16] * 15 + [256] * 15 + [4096] * 15, np.int64)
    assert w.sum() == size
    data = np.repeat(np.arange(len(w), dtype=np.uint8), w)
    rng.shuffle(data)
    return data


@pytest.mark.parametrize(
    "arity,min_depth", [(2, 15), (3, 10), (16, 4)]
)
def test_pallas_deep_codes(arity, min_depth, rng):
    """Exponentially skewed histograms: every symbol carries a code and
    the deepest codes (max_len >= min_depth) appear in the data, so a
    packed-length truncation in the kernel corrupts the wire output."""
    from data_compression_tpu.ops.pallas.encode_kernel import (
        CHUNK_SYMS,
        LANES,
        encode_blocks_pallas,
    )

    S = CHUNK_SYMS * LANES
    data = _skewed_block(rng, arity, S).reshape(1, S)
    raw_lens = np.array([S], np.int64)
    freqs = np.bincount(data[0], minlength=256)
    table = lengths_to_codes(capped_lengths(freqs, arity), arity)
    assert table.max_len >= min_depth, "fixture lost its depth"

    out, nbytes, _ = encode_blocks_pallas(
        data, raw_lens, [table], arity, interpret=True
    )
    out, nbytes = np.asarray(out), np.asarray(nbytes)
    C = CHUNK_SYMS
    for c in range(LANES):
        expect = encode_chunk_np(data[0, c * C : (c + 1) * C], table)
        assert out[c, : nbytes[c]].tobytes() == expect, f"arity {arity} chunk {c}"


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


@pytest.mark.parametrize("arity", [2, 3, 16])
def test_pallas_compact_block_contiguous(arity, rng):
    """Block-compacting kernel (interpret): the [128, Wf] int32 rows
    hold the block's chunk payloads CONTIGUOUSLY in memory order —
    byte-identical to the per-chunk encoder's concatenation.  n=3
    exercises the in-kernel trit->wire-byte repack + generic concat
    (round-5: trinary admitted to the compact path)."""
    import jax.numpy as jnp

    from data_compression_tpu.config import ARITY_DIGITS_PER_BYTE
    from data_compression_tpu.huffman import batched as hb
    from data_compression_tpu.ops.pallas.encode_kernel import (
        LANES,
        _encode_pallas_compact,
        encode_blocks_pallas,
    )

    C = 128
    S = C * LANES
    data = np.frombuffer(ascii_text(rng, 2 * S), np.uint8).reshape(2, S).copy()
    raw_lens = np.array([S, S - 3 * C - 7], np.int64)
    hists = np.stack(
        [np.bincount(data[i, : raw_lens[i]], minlength=256) for i in range(2)]
    ).astype(np.int64)
    tb = hb.codes_batch(hb.capped_lengths_batch(hists, arity), arity)
    tables = [tb.table(i) for i in range(2)]

    # reference: per-chunk wire payloads from the proven kernel path
    out, nbytes, _ = encode_blocks_pallas(
        data, raw_lens, tables, arity, interpret=True
    )
    out, nbytes = np.asarray(out), np.asarray(nbytes)

    dense = hb.dense_rows(tb)
    meta = np.stack([tb.n_used, raw_lens.astype(np.int32)], axis=1).astype(
        np.int32
    )
    syms_t = jnp.transpose(data.reshape(2, LANES, C), (0, 2, 1))
    words, nbd = _encode_pallas_compact(
        syms_t, jnp.asarray(dense), jnp.asarray(meta), arity=arity,
        chunk_syms=C, interpret=True,
    )
    D = ARITY_DIGITS_PER_BYTE[arity]
    digits = np.transpose(np.asarray(nbd), (0, 2, 1)).reshape(2, LANES)
    nb = -(-digits // D)
    wbytes = np.asarray(words).view(np.int32).reshape(2, -1).view(np.uint8)
    for b in range(2):
        want = b"".join(
            out[b * LANES + c, : nbytes[b * LANES + c]].tobytes()
            for c in range(LANES)
        )
        assert int(nb[b].sum()) == len(want)
        assert wbytes[b, : len(want)].tobytes() == want, f"arity {arity} block {b}"
