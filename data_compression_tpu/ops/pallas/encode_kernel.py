"""Pallas TPU kernel: fused Huffman chunk encode, one block per grid cell.

Fuses the whole encode (table lookup -> per-symbol bit-field words ->
hierarchical merge) into VMEM, eliminating the inter-stage HBM round
trips that cap the pure-XLA formulation (ops/encode_fast.py).

Layout: **chunk-per-lane.**  A 64 KiB block = 128 chunks x 512 symbols;
the kernel sees symbols as [512, 128] with the chunk index in the lane
dimension, so every merge level is elementwise across lanes and the
pair reductions walk the sublane-major axis — no cross-lane traffic at
all.  One canonical table per block rides in VMEM as a DENSE 256-entry
(packed code, digit count) array laid out as two 128-lane rows; the
symbol -> code lookup is two lane-wise dynamic gathers
(jnp.take_along_axis on the lane axis, Mosaic's dynamic-gather op) plus
one select — constant cost per symbol, independent of the alphabet
density.  This replaced a dynamic-bound select loop over the used
symbols (~2 VPU ops per used symbol per position, i.e. ~120 ops/byte on
text, ~512 on dense alphabets) that dominated round-1 profiles.

Output is the raw [Wf, 128] u32 bit-field buffer per block plus total
bit counts; the (cheap) wire-byte conversion and per-chunk transpose
stay in XLA (ops/encode_fast.words_to_wire_bytes), so the kernel output
is wire-identical to the XLA and numpy encoders (tested).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from data_compression_tpu.config import ARITY_DIGITS_PER_BYTE, ARITY_MAX_LEN
from data_compression_tpu.huffman.canonical import CanonicalTable
from data_compression_tpu.ops.encode_fast import (
    BITS_PER_DIGIT,
    pack_encode_table,
)
from data_compression_tpu.ops.huffman_coding import _cap_digits
from data_compression_tpu.utils.jit_cache import enable_persistent_cache

# Importing this module means a Pallas compile is imminent (the slow
# path the persistent cache exists for); bare library import stays
# config-neutral (ADVICE r3).
enable_persistent_cache()

CHUNK_SYMS = 512  # 128 chunks x 512 symbols = 64 KiB block
LANES = 128


MAXLEN_BUCKETS = (8, 10, 12, 15)  # compile-time merge-capacity tiers


def _levels(arity: int, maxlen: int | None = None, C: int = CHUNK_SYMS):
    """Static (W, W2) schedule of the merge tree for C-symbol chunks.

    ``maxlen`` specializes level capacities to the batch's actual max
    code length (host picks the smallest bucket that fits) — the wire
    output is identical, the capacities are upper bounds, but text
    tables (max len ~12) skip ~20% of the deep-level word traffic."""
    if maxlen is None:
        maxlen = ARITY_MAX_LEN[arity]
    maxf = maxlen * BITS_PER_DIGIT[arity]
    cap_bits = _cap_digits(C, arity) * BITS_PER_DIGIT[arity]
    Wf = -(-cap_bits // 32)
    sched = []
    P, W = C, 1
    level = 0
    while P > 1:
        level += 1
        need = min((1 << level) * maxf, cap_bits)
        W2 = min(-(-need // 32), Wf)
        sched.append((P, W, W2))
        P //= 2
        W = W2
    return sched, Wf


def _shift_words(x, k):
    """Move word i -> i+k along axis -2 (towards higher words)."""
    if k == 0:
        return x
    W = x.shape[-2]
    if k >= W:
        return jnp.zeros_like(x)
    return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(k, 0), (0, 0)])[..., :W, :]


def _mshl(b, nbits):
    """Multiword shift-left: b [Q, W, 128] int32, nbits [Q, 1, 128]."""
    W = b.shape[-2]
    wsh = jax.lax.shift_right_logical(nbits, 5)
    bsh = nbits & 31
    x = b
    t = 0
    while (1 << t) < W:
        moved = _shift_words(x, 1 << t)
        sel = (jax.lax.shift_right_logical(wsh, t) & 1) == 1
        x = jnp.where(sel, moved, x)
        t += 1
    prev = _shift_words(x, 1)
    lo = jax.lax.shift_left(x, bsh)
    carry = jnp.where(
        bsh == 0,
        0,
        jax.lax.shift_right_logical(prev, 32 - bsh),
    )
    return lo | carry


# For arity 2 and 16 the (code, length) pair fits one int32, so the
# dense lookup table holds a single packed entry per symbol; arity 3
# codes are 30 bits and keep separate code and digit-count tables.  The
# length is packed as the DIGIT count (<= ARITY_MAX_LEN, 4 bits at n=2
# / 3 bits at n=16), never the bit count: at n=16 the bit count
# (lens*4, max 28) needs 5 bits but only bits 28..30 sit above the code
# field, so packing bits would truncate lengths 16/20/24/28 to 0/4/8/12.
# The kernel recovers bits as digits * BITS_PER_DIGIT.
PACKED_LEN_SHIFT = {2: ARITY_MAX_LEN[2] * BITS_PER_DIGIT[2],
                    16: ARITY_MAX_LEN[16] * BITS_PER_DIGIT[16]}


def _gather256(lo_row, hi_row, s):
    """Dense 256-entry table lookup on the VPU lane shuffle network.

    ``lo_row``/``hi_row``: [1, 128] int32 — table entries for symbols
    0-127 and 128-255.  ``s``: int32 symbols in [0, 256).  Two lane-wise
    dynamic gathers + one select; constant cost per element.
    """
    i7 = s & 127
    lo = jnp.take_along_axis(jnp.broadcast_to(lo_row, s.shape), i7, axis=1)
    hi = jnp.take_along_axis(jnp.broadcast_to(hi_row, s.shape), i7, axis=1)
    return jnp.where(s < 128, lo, hi)


def _roll_lanes(x, k):
    """Static lane-axis roll right by k (towards higher lane index)."""
    k %= x.shape[1]
    if k == 0:
        return x
    return jnp.concatenate([x[:, -k:], x[:, :-k]], axis=1)


def _rows_down(x, k):
    """Shift rows towards higher indices by k, zero-fill low rows."""
    if k == 0:
        return x
    R = x.shape[0]
    if k >= R:
        return jnp.zeros_like(x)
    return jnp.pad(x, [(k, 0), (0, 0)])[:R]


def _rows_up(x, k):
    """Shift rows towards lower indices by k, zero-fill high rows."""
    if k == 0:
        return x
    R = x.shape[0]
    if k >= R:
        return jnp.zeros_like(x)
    return jnp.pad(x, [(0, k), (0, 0)])[k:]


def _word_down_static(y, Wf: int, k: int, rowi):
    """out(w) = in(w + k) in the LANE-MAJOR composite layout (word w of
    a group at (row w % Wf, base + w // Wf)): decompose k into kl lanes
    + kr rows; group-crossing wrap is the caller's garbage region (it
    masks past the merged length).  ``rowi`` is the row iota."""
    kl, kr = k // Wf, k % Wf
    if kr == 0:
        return _roll_lanes(y, -kl)
    v1 = _rows_up(_roll_lanes(y, -kl), kr)
    v2 = _rows_down(_roll_lanes(y, -(kl + 1)), Wf - kr)
    return jnp.where(rowi < Wf - kr, v1, v2)


def _concat_stage(buf, blen, Wf: int, levels: int = 7):
    """Cross-lane concatenation: 128 per-chunk byte-aligned bit buffers
    (lane c = chunk c, words along rows) merge into ONE block-contiguous
    buffer.  LANE-MAJOR composite layout: at group width G, word w of a
    group lives at (row w % Wf, base + w // Wf) — level 0 is exactly
    the per-chunk buffer, and an even node never moves when its group
    doubles (no relayout, no strided slices: only lane rolls, row
    shifts, and selects — all Mosaic-native).  The odd node's words
    already sit at logical offset g*Wf, so they shift DOWN by
    g*Wf - even_words (log2-decomposed static steps selected by the
    per-group amount) plus the byte remainder; group-crossing roll
    garbage lands strictly past the merged length and is masked each
    level.  ``blen`` [1, 128]: byte-aligned bit count per lane
    (multiples of 8; both n=2 and n=16 use 8 field bits per wire byte).
    Returns (words [Wf, 128] int32 lane-major — i.e. payload word w at
    (w % Wf, w // Wf) — and total_bits [1, 128] broadcast)."""
    x = buf
    L = blen
    rowi = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    g = 1
    while g < min(LANES, 1 << levels):
        G2 = 2 * g
        lane_in = lanei % G2
        lo = lane_in < g
        lL = jnp.where(lo[:1], L, _roll_lanes(L, g))  # even half's bits
        lR = jnp.where(lo[:1], _roll_lanes(L, -g), L)  # odd half's bits
        even = jnp.where(lo, x, 0)
        y = jnp.where(lo, 0, x)
        # shift odd down by g*Wf - even_words, then the bit remainder
        wsh = jax.lax.shift_right_logical(lL, 5)
        k = g * Wf - wsh
        t = 0
        while (1 << t) <= g * Wf:
            moved = _word_down_static(y, Wf, 1 << t, rowi)
            sel = (jax.lax.shift_right_logical(k, t) & 1) == 1
            y = jnp.where(sel, moved, y)
            t += 1
        bsh = lL & 31
        # prev word (logical w-1): row-down with a lane-carry wrap
        prev = jnp.where(
            rowi >= 1,
            _rows_down(y, 1),
            _rows_up(_roll_lanes(y, 1), Wf - 1),
        )
        carry = jnp.where(
            bsh == 0, 0, jax.lax.shift_right_logical(prev, (32 - bsh) & 31)
        )
        y = jax.lax.shift_left(y, bsh) | carry
        x = even | y
        L = lL + lR
        # group-crossing roll garbage sits past the merged length
        widx = rowi + Wf * lane_in
        x = jnp.where(widx < ((L + 31) >> 5), x, 0)
        g = G2
    return x, L


def _make_kernel(arity: int, maxlen: int | None = None, stages: int = 3,
                 C: int = CHUNK_SYMS, compact: bool = False):
    """stages: profiling ablation — 1: table lookup only, 2: + merge
    tree, 3: full (+ wire-byte conversion).  Stages < 3 write truncated
    garbage to the byte output (consumed so Mosaic cannot DCE the
    measured work); only stage 3 is wire-correct.  ``C``: symbols per
    chunk (= block_size / 128 lanes); any power of two works.
    ``compact``: emit ONE block-contiguous payload (int32 composite
    words) via the cross-lane concat stage instead of per-chunk rows.
    n=2/16 concat the byte-aligned bit buffers directly; n=3 repacks
    trits into wire bytes chunk-locally FIRST (the repack is not
    bit-shift-composable) and then concats the byte-aligned wire-byte
    words with the same generic stage."""
    sched, Wf = _levels(arity, maxlen, C)
    bpd = BITS_PER_DIGIT[arity]
    D = ARITY_DIGITS_PER_BYTE[arity]
    cap_digits = _cap_digits(C, arity)
    MB = cap_digits // D  # wire bytes per chunk
    sh = PACKED_LEN_SHIFT.get(arity)
    W3 = -(-MB // 4)  # n=3 compact: wire-byte words per chunk
    W_out = W3 if (compact and arity == 3) else Wf

    def kernel(dense_ref, meta_ref, syms_ref, bytes_ref, nbytes_ref,
               *scratch):
        s = syms_ref[0].astype(jnp.int32)  # [C, 128]
        raw_len = meta_ref[0, 0, 1]

        # Dense-table lookup: two lane gathers + one select per symbol.
        if sh is not None:
            p = _gather256(dense_ref[0, 0:1, :], dense_ref[0, 1:2, :], s)
            l = jax.lax.shift_right_logical(p, sh) * bpd  # digits -> bits
            w = p & ((1 << sh) - 1)
        else:
            w = _gather256(dense_ref[0, 0:1, :], dense_ref[0, 1:2, :], s)
            l = _gather256(dense_ref[0, 2:3, :], dense_ref[0, 3:4, :], s)

        # mask positions past the block's valid length: chunk = lane,
        # count per lane = clip(raw_len - lane*C, 0, C)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 0)
        cc = jnp.clip(raw_len - lane * C, 0, C)
        valid = pos < cc
        w = jnp.where(valid, w, 0)
        l = jnp.where(valid, l, 0)

        if stages <= 1:  # ablation: lookup only
            bytes_ref[0, :C, :] = (w & 0xFF).astype(jnp.uint8)
            nbytes_ref[0] = l[0:1]
            return

        words = w[:, None, :]  # [P, W=1, 128]
        lens = l
        for (P, W, W2) in sched:
            x = words.reshape(P // 2, 2, W, LANES)
            a, b = x[:, 0], x[:, 1]
            ll = lens.reshape(P // 2, 2, LANES)
            la, lb = ll[:, 0], ll[:, 1]
            if W2 > W:
                padw = [(0, 0), (0, W2 - W), (0, 0)]
                a = jnp.pad(a, padw)
                b = jnp.pad(b, padw)
            words = a | _mshl(b, la[:, None, :])
            lens = la + lb
        buf = words[0]  # [W_last, 128] bit-field buffer
        if buf.shape[0] < Wf:  # maxlen-specialized schedule: upper words 0
            buf = jnp.pad(buf, [(0, Wf - buf.shape[0]), (0, 0)])
        if stages <= 2:  # ablation: lookup + merge, no wire conversion
            bytes_ref[0, :Wf, :] = (buf & 0xFF).astype(jnp.uint8)
            nbytes_ref[0] = lens // bpd
            return
        if compact:
            # Cross-lane concatenation: the block's chunks fuse into one
            # contiguous payload IN VMEM.  For n=2/16, 8 field bits = 1
            # wire byte, so the bit buffers concat directly; n=3 first
            # repacks each chunk's 2-bit trit fields into 5-trit wire
            # bytes (packed 4-per-word) via a predicated VMEM scratch,
            # then concats the byte-aligned word buffers with the same
            # stage.  The lane-major concat result transposes once so
            # the [128, W_out] int32 HBM rows ARE the block payload
            # bytes in memory order; rows past the block's length are
            # never written.
            if arity == 3:
                w3_ref = scratch[0]  # [W3, LANES] int32 wire-byte words
                digits = lens // bpd
                nb_c = (digits + 4) // 5  # wire bytes per chunk
                maxb = jnp.max(nb_c)
                SEGW = 60
                npg = SEGW * 16 // 5  # 192 wire bytes per group
                for g in range(Wf // SEGW):
                    @pl.when(g * npg < maxb)
                    def _(g=g):
                        seg = jax.lax.slice(
                            buf, (g * SEGW, 0), ((g + 1) * SEGW, LANES)
                        )
                        trits = jnp.stack(
                            [jax.lax.shift_right_logical(seg, 2 * k) & 3
                             for k in range(16)],
                            axis=1,
                        ).reshape(SEGW * 16, LANES)
                        t5 = trits.reshape(npg, 5, LANES)
                        byts = (
                            t5[:, 0] + 3 * t5[:, 1] + 9 * t5[:, 2]
                            + 27 * t5[:, 3] + 81 * t5[:, 4]
                        )
                        b4 = byts.reshape(npg // 4, 4, LANES)
                        w3_ref[pl.ds(g * npg // 4, npg // 4), :] = (
                            b4[:, 0] | (b4[:, 1] << 8) | (b4[:, 2] << 16)
                            | (b4[:, 3] << 24)
                        )

                    @pl.when(g * npg >= maxb)
                    def _(g=g):
                        # concat's carry path reads one word past each
                        # lane's valid length: dead groups must be zero
                        w3_ref[pl.ds(g * npg // 4, npg // 4), :] = (
                            jnp.zeros((npg // 4, LANES), jnp.int32)
                        )
                cbuf = w3_ref[:, :]
                blen = nb_c * 8  # wire bits, byte-aligned by construction
            else:
                cbuf = buf
                blen = ((lens + 7) >> 3) << 3  # byte-aligned bits/chunk
            xw, Ltot = _concat_stage(cbuf, blen, W_out)
            xt = jnp.transpose(xw)  # [128, W_out]: row q = words q*W_out..
            maxbits = jnp.max(Ltot)
            WT = 8
            for gi in range(LANES // WT):
                @pl.when(gi * WT * W_out * 32 < maxbits)
                def _(gi=gi):
                    bytes_ref[0, gi * WT:(gi + 1) * WT, :] = jax.lax.slice(
                        xt, (gi * WT, 0), ((gi + 1) * WT, W_out)
                    )
            nbytes_ref[0] = lens // bpd
            return
        # Wire-byte conversion in VMEM (was an 18 ms XLA pass).  Output
        # tiles are PREDICATED on the block's max per-chunk wire length:
        # compressed payloads are typically ~0.6x the input, so writing
        # the full worst-case buffer (1.9x input at n=2) would make the
        # kernel HBM-write-bound on dead rows.  Rows past the guard are
        # never written (consumers slice each chunk to its nbytes).
        maxbytes = jnp.max(lens) // (bpd * D) + 1  # >= ceil(maxbits/(bpd*D))
        if arity == 3:
            # 2-bit fields -> trits -> 5 trits per byte.  Segmented
            # (60 words = 960 trits = 192 bytes per pass; LCM-aligned:
            # 5 words = 80 trits = 16 bytes) so the expanded trit
            # temporaries stay <1 MB — the whole-buffer expansion
            # overflows the 16 MB VMEM scoped stack.
            SEGW = 60
            nb = SEGW * 16 // 5
            for g in range(Wf // SEGW):
                @pl.when(g * nb < maxbytes)
                def _(g=g):
                    seg = jax.lax.slice(
                        buf, (g * SEGW, 0), ((g + 1) * SEGW, LANES)
                    )
                    trits = jnp.stack(
                        [jax.lax.shift_right_logical(seg, 2 * k) & 3
                         for k in range(16)],
                        axis=1,
                    ).reshape(SEGW * 16, LANES)
                    t5 = trits.reshape(nb, 5, LANES)
                    byts = (
                        t5[:, 0]
                        + 3 * t5[:, 1]
                        + 9 * t5[:, 2]
                        + 27 * t5[:, 3]
                        + 81 * t5[:, 4]
                    )
                    bytes_ref[0, g * nb:(g + 1) * nb, :] = byts.astype(jnp.uint8)
        else:
            # word tile near 32 that divides Wf exactly
            WT = next(w for w in range(32, 0, -1) if Wf % w == 0)
            for g in range(Wf // WT):
                @pl.when(g * WT * 4 < maxbytes)
                def _(g=g):
                    seg = jax.lax.slice(buf, (g * WT, 0), ((g + 1) * WT, LANES))
                    byts = jnp.stack(
                        [jax.lax.shift_right_logical(seg, 8 * k) & 0xFF
                         for k in range(4)],
                        axis=1,
                    ).reshape(WT * 4, LANES)
                    hi = min((g + 1) * WT * 4, MB)
                    bytes_ref[0, g * WT * 4:hi, :] = (
                        byts[: hi - g * WT * 4].astype(jnp.uint8)
                    )
        nbytes_ref[0] = lens // bpd  # total digits; bytes derived outside

    return kernel, W_out, MB


@functools.partial(
    jax.jit,
    static_argnames=("arity", "interpret", "maxlen", "stages", "chunk_syms"),
)
def _encode_pallas(
    syms_t: jnp.ndarray,  # [B, C, 128] uint8/int32 (symbol-major)
    dense: jnp.ndarray,  # [B, R, 128] int32 dense lookup rows (R=2 or 4)
    meta: jnp.ndarray,  # [B, 2] int32: used_count, raw_len
    *,
    arity: int,
    interpret: bool = False,
    maxlen: int | None = None,
    stages: int = 3,
    chunk_syms: int = CHUNK_SYMS,
):
    B = syms_t.shape[0]
    kernel, Wf, MB = _make_kernel(arity, maxlen, stages, chunk_syms)
    C = chunk_syms
    R = dense.shape[1]
    meta = meta[:, None, :]
    byts, nbytes = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, MB, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, MB, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(dense, meta, syms_t)
    return byts, nbytes


@functools.partial(
    jax.jit,
    static_argnames=("arity", "interpret", "maxlen", "chunk_syms"),
)
def _encode_pallas_compact(
    syms_t: jnp.ndarray,  # [B, C, 128] uint8/int32 (symbol-major)
    dense: jnp.ndarray,  # [B, R, 128] int32 dense lookup rows
    meta: jnp.ndarray,  # [B, 2] int32: used_count, raw_len
    *,
    arity: int,
    interpret: bool = False,
    maxlen: int | None = None,
    chunk_syms: int = CHUNK_SYMS,
):
    """Block-compacting encode (n=2/3/16): -> (words [B, 128, Wf] int32
    — each block's CONTIGUOUS payload bytes in memory order
    (little-endian words); rows past the block's length are
    UNINITIALIZED — and total digits [B, 1, 128] per chunk, from which
    per-chunk wire byte counts follow)."""
    assert arity in (2, 3, 16), "compact encode: byte-aligned wire payloads"
    B = syms_t.shape[0]
    kernel, Wf, MB = _make_kernel(arity, maxlen, 3, chunk_syms, compact=True)
    C = chunk_syms
    R = dense.shape[1]
    meta = meta[:, None, :]
    scratch = (
        [pltpu.VMEM((Wf, LANES), jnp.int32)] if arity == 3 else []
    )  # n=3: per-chunk wire-byte words before the cross-lane concat
    words, nbytes = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES, Wf), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, LANES, Wf), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(dense, meta, syms_t)
    return words, nbytes


def prep_tables(
    tables: List[CanonicalTable], arity: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: dense 256-entry lookup rows for the lane-gather lookup.

    Returns (dense [B, R, 128] int32, count [B] int32).  R = 2 (packed
    (digits << sh) | code, split into lo/hi 128-lane rows) when the pair
    fits one int32, else R = 4 (code lo/hi rows + bit-count lo/hi rows).
    Unused symbols hold 0 (length 0) and are never gathered by valid
    data.
    """
    B = len(tables)
    sh = PACKED_LEN_SHIFT.get(arity)
    bpd = BITS_PER_DIGIT[arity]
    R = 2 if sh is not None else 4
    dense = np.zeros((B, R, 128), np.int32)
    count = np.zeros((B,), np.int32)
    cache = {}
    for i, t in enumerate(tables):
        key = id(t)
        if key not in cache:
            pt, bt = pack_encode_table(t)
            used = np.flatnonzero(bt > 0)
            pt = np.where(bt > 0, pt, 0)  # unused -> all-zero entry
            if sh is not None:
                digits = bt.astype(np.int64) // bpd
                assert int(digits.max(initial=0)) * bpd <= sh
                packed = ((digits << sh) | pt.astype(np.int64)).astype(np.int32)
                rows = packed.reshape(2, 128)
            else:
                rows = np.concatenate(
                    [pt.astype(np.int32).reshape(2, 128),
                     bt.astype(np.int32).reshape(2, 128)]
                )
            cache[key] = (rows, used.size)
        rows, n = cache[key]
        dense[i] = rows
        count[i] = n
    return dense, count


def encode_blocks_pallas(
    blocks: jnp.ndarray,  # [B, 65536] uint8
    raw_lens: np.ndarray,  # [B]
    tables: List[CanonicalTable],
    arity: int,
    interpret: bool = False,
):
    """-> (wire bytes [B*128, max_chunk_bytes], nbytes [B*128]) —
    wire-identical to encode_chunks_fast with chunk_syms=512.

    Contract: only the first ``nbytes[i]`` bytes of row i are defined.
    Rows past each chunk's valid length are UNINITIALIZED (the kernel
    predicates HBM writes on the block's max per-chunk wire length, so
    trailing tiles are never written).  Consumers — including any
    differential/parity harness — must slice row i to ``nbytes[i]``
    before comparing or serializing.

    Any power-of-two block size >= 16 KiB works: a block is always 128
    lane-chunks of S/128 symbols each."""
    B, S = blocks.shape
    C = S // LANES
    assert S == C * LANES and C & (C - 1) == 0 and C >= 128, (
        "pallas encoder requires a power-of-two block of >= 128-symbol "
        f"lane chunks, got block_size {S}"
    )
    bpd = BITS_PER_DIGIT[arity]
    D = ARITY_DIGITS_PER_BYTE[arity]
    cap_digits = _cap_digits(C, arity)

    dense, count = prep_tables(tables, arity)
    meta = np.stack([count, np.asarray(raw_lens, np.int32)], axis=1).astype(np.int32)

    actual_max = max(int(t.max_len) for t in tables)
    maxlen = next(
        (m for m in MAXLEN_BUCKETS if m >= actual_max), ARITY_MAX_LEN[arity]
    )
    maxlen = min(maxlen, ARITY_MAX_LEN[arity])

    syms_t = jnp.transpose(
        jnp.asarray(blocks).reshape(B, LANES, C), (0, 2, 1)
    )  # [B, C, 128]
    byts, nbytes = _encode_pallas(
        syms_t,
        jnp.asarray(dense),
        jnp.asarray(meta),
        arity=arity,
        interpret=interpret,
        maxlen=maxlen,
        chunk_syms=C,
    )
    # [B, MB, 128] u8 -> [B*128, MB] (chunk-major wire payloads)
    out = jnp.transpose(byts, (0, 2, 1)).reshape(B * LANES, -1)
    total_digits = jnp.transpose(nbytes, (0, 2, 1)).reshape(B * LANES)
    nbytes = -(-total_digits // D)
    return out, nbytes, total_digits
