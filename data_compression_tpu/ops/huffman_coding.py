"""Vectorized n-ary Huffman encode/decode (the device compute path).

Replaces the reference's per-symbol serial bit loop (the stubbed
``represent_items_with_codes``, n_ary_huffman.c:1621-1678) with a fully
data-parallel formulation over *chunks* — fixed groups of symbols whose
payloads start byte-aligned, so every chunk encodes and decodes
independently (the framing stores per-chunk byte lengths).

Key ideas, all static-shape and gather-based (no serial bit cursor, no
data-dependent scatter on the hot path):

Encode a chunk of C symbols:
  1. gather (code, len) per symbol from the canonical table;
  2. exclusive prefix-sum of lens -> digit offset per symbol;
  3. invert the offsets into ``sym_of_digit`` with one scatter-add of C
     ones + a cumsum (run-length expansion without searchsorted);
  4. every output digit j is then an independent gather:
     ``digit = (code[sym_of[j]] / n^(len-1-(j-off))) % n`` (MSB-first
     across the code);
  5. pack digits into bytes little-endian-within-byte: 8 bits, 5 trits
     (3^5=243, the reference's trit-packing scheme,
     n_ary_huffman.c:745-753), or 2 nybbles per byte.

Decode runs the standard canonical trick (first-code-per-length, which
the reference gestures at, n_ary_huffman.c:1509-1528) on an L-digit
window scaled to a common denominator: the code length of the window
value w is the smallest l with w < limit_scaled[l] — a comparison
against a monotone table, i.e. branch-free.  The per-symbol digit
cursor is the only serial dependency, carried by a lax.scan whose lanes
are the (thousands of) chunks.

Everything is int32; per-arity length caps (config.ARITY_MAX_LEN) keep
n^L < 2^31.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from data_compression_tpu.config import ARITY_DIGITS_PER_BYTE, ARITY_MAX_LEN


def _cap_digits(chunk_syms: int, arity: int) -> int:
    """Static per-chunk digit capacity, rounded to whole bytes."""
    d = ARITY_DIGITS_PER_BYTE[arity]
    raw = chunk_syms * ARITY_MAX_LEN[arity]
    return -(-raw // d) * d


def max_chunk_bytes(chunk_syms: int, arity: int) -> int:
    return _cap_digits(chunk_syms, arity) // ARITY_DIGITS_PER_BYTE[arity]


@functools.partial(jax.jit, static_argnames=("arity", "chunk_syms"))
def encode_chunks(
    syms: jnp.ndarray,  # [N, C] uint8/int32 symbols
    counts: jnp.ndarray,  # [N] valid symbols per chunk
    codes_tab: jnp.ndarray,  # [T, S] int32 canonical codes
    lens_tab: jnp.ndarray,  # [T, S] int32 code lengths
    tbl_of_chunk: jnp.ndarray,  # [N] table index per chunk
    *,
    arity: int,
    chunk_syms: int,
):
    """Encode chunks -> (packed bytes [N, max_bytes], nbytes [N], ndigits [N])."""
    N, C = syms.shape
    assert C == chunk_syms
    L = ARITY_MAX_LEN[arity]
    D = ARITY_DIGITS_PER_BYTE[arity]
    cap = _cap_digits(C, arity)
    nbytes_cap = cap // D

    syms = syms.astype(jnp.int32)
    pos = jnp.arange(C)[None, :]
    valid = pos < counts[:, None]

    codes = codes_tab[tbl_of_chunk[:, None], syms]  # [N, C]
    lens = jnp.where(valid, lens_tab[tbl_of_chunk[:, None], syms], 0)

    offs = jnp.cumsum(lens, axis=1) - lens  # exclusive prefix sum
    total_digits = offs[:, -1] + lens[:, -1]

    # Run-length expansion: sym_of[j] = i for j in [offs[i], offs[i+1]).
    # One scatter-add of C markers + a cumsum — no searchsorted.
    starts = jnp.where(lens > 0, offs, cap)  # zero-length syms -> dropped
    markers = jnp.zeros((N, cap + 1), jnp.int32)
    markers = markers.at[jnp.arange(N)[:, None], starts].add(1, mode="drop")
    sym_of = jnp.cumsum(markers[:, :cap], axis=1) - 1  # [N, cap]
    sym_of = jnp.clip(sym_of, 0, C - 1)

    j = jnp.arange(cap)[None, :]
    off_j = jnp.take_along_axis(offs, sym_of, axis=1)
    len_j = jnp.take_along_axis(lens, sym_of, axis=1)
    code_j = jnp.take_along_axis(codes, sym_of, axis=1)
    # MSB-first digit of the code at stream position j.
    pow_n = jnp.asarray(arity ** np.arange(L + 1), jnp.int32)
    place = jnp.clip(len_j - 1 - (j - off_j), 0, L)
    digit = (code_j // pow_n[place]) % arity
    digit = jnp.where(j < total_digits[:, None], digit, 0)

    # Pack D digits per byte, first digit in the lowest place.
    dmat = digit.reshape(N, nbytes_cap, D)
    weights = jnp.asarray(arity ** np.arange(D), jnp.int32)
    packed = jnp.sum(dmat * weights[None, None, :], axis=-1).astype(jnp.uint8)

    nbytes = -(-total_digits // D)  # ceil
    return packed, nbytes, total_digits


@functools.partial(jax.jit, static_argnames=("arity", "chunk_syms"))
def decode_chunks(
    payload: jnp.ndarray,  # [N, max_bytes] uint8
    counts: jnp.ndarray,  # [N] symbols to decode per chunk
    limit_scaled: jnp.ndarray,  # [T, L+1] int32 (monotone nondecreasing)
    base_minus_first: jnp.ndarray,  # [T, L+1] int32
    symbols_tab: jnp.ndarray,  # [T, S] int32 length-sorted symbols
    tbl_of_chunk: jnp.ndarray,  # [N]
    *,
    arity: int,
    chunk_syms: int,
):
    """Decode chunks -> symbols [N, C] uint8."""
    N = payload.shape[0]
    C = chunk_syms
    L = ARITY_MAX_LEN[arity]
    D = ARITY_DIGITS_PER_BYTE[arity]
    cap = _cap_digits(C, arity)

    # Unpack bytes -> digits (little-endian within byte), padded with a
    # guard window of L zeros so the last window never reads OOB.
    b = payload.astype(jnp.int32)
    dpow = jnp.asarray(arity ** np.arange(D), jnp.int32)
    digits = (b[:, :, None] // dpow[None, None, :]) % arity  # [N, bytes, D]
    digits = digits.reshape(N, cap)
    digits = jnp.concatenate([digits, jnp.zeros((N, L), jnp.int32)], axis=1)

    pow_n = jnp.asarray(arity ** np.arange(L + 1), jnp.int32)
    win_w = pow_n[jnp.arange(L - 1, -1, -1)]  # n^(L-1), ..., n^0

    lim = limit_scaled[tbl_of_chunk]  # [N, L+1]
    bmf = base_minus_first[tbl_of_chunk]  # [N, L+1]
    syms_t = symbols_tab[tbl_of_chunk]  # [N, S]

    lane = jnp.arange(N)

    def step(carry, i):
        off = carry  # [N] digit cursor
        # L-digit window value, scaled to the common denominator n^L.
        win = jax.vmap(
            lambda d, o: jax.lax.dynamic_slice(d, (o,), (L,))
        )(digits, off)
        w = jnp.sum(win * win_w[None, :], axis=1)  # [N]
        # code length = 1 + #{l >= 1 : limit_scaled[l] <= w}
        ln = 1 + jnp.sum(w[:, None] >= lim[:, 1:], axis=1)
        ln = jnp.clip(ln, 1, L)
        value = w // pow_n[L - ln]
        sidx = jnp.take_along_axis(bmf, ln[:, None], axis=1)[:, 0] + value
        sidx = jnp.clip(sidx, 0, syms_t.shape[1] - 1)
        sym = jnp.take_along_axis(syms_t, sidx[:, None], axis=1)[:, 0]
        active = i < counts
        off = jnp.where(active, off + ln, off)
        return off, jnp.where(active, sym, 0)

    _, out = jax.lax.scan(step, jnp.zeros((N,), jnp.int32), jnp.arange(C))
    return out.T.astype(jnp.uint8)  # [N, C]
