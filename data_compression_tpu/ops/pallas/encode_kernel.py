"""Pallas TPU kernel: fused Huffman chunk encode, one block per grid cell.

Fuses the whole encode (table lookup -> per-symbol bit-field words ->
hierarchical merge) into VMEM, eliminating the inter-stage HBM round
trips that cap the pure-XLA formulation (ops/encode_fast.py).

Layout: **chunk-per-lane.**  A 64 KiB block = 128 chunks x 512 symbols;
the kernel sees symbols as [512, 128] with the chunk index in the lane
dimension, so every merge level is elementwise across lanes and the
pair reductions walk the sublane-major axis — no cross-lane traffic at
all.  One canonical table per block rides in SMEM as a (used-symbol,
packed-code, bit-length) list; the lookup is a dynamic-bound fori over
the used symbols (typically ~60 for text, worst case 256), a masked
select per entry.

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

CHUNK_SYMS = 512  # 128 chunks x 512 symbols = 64 KiB block
LANES = 128


MAXLEN_BUCKETS = (8, 10, 12, 15)  # compile-time merge-capacity tiers


def _levels(arity: int, maxlen: int | None = None):
    """Static (W, W2) schedule of the merge tree.

    ``maxlen`` specializes level capacities to the batch's actual max
    code length (host picks the smallest bucket that fits) — the wire
    output is identical, the capacities are upper bounds, but text
    tables (max len ~12) skip ~20% of the deep-level word traffic."""
    if maxlen is None:
        maxlen = ARITY_MAX_LEN[arity]
    maxf = maxlen * BITS_PER_DIGIT[arity]
    cap_bits = _cap_digits(CHUNK_SYMS, arity) * BITS_PER_DIGIT[arity]
    Wf = -(-cap_bits // 32)
    sched = []
    P, W = CHUNK_SYMS, 1
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


LOOKUP_UNROLL = 8

# For arity 2 and 16 the (code, length) pair fits one int32, so the
# used-symbol lookup loop needs a single select per entry; arity 3
# codes are 30 bits and keep separate code/length selects.  The length
# is packed as the DIGIT count (<= ARITY_MAX_LEN, 4 bits at n=2 /
# 3 bits at n=16), never the bit count: at n=16 the bit count (lens*4,
# max 28) needs 5 bits but only bits 28..30 sit above the code field,
# so packing bits would truncate lengths 16/20/24/28 to 0/4/8/12.
# The kernel recovers bits as digits * BITS_PER_DIGIT.
PACKED_LEN_SHIFT = {2: ARITY_MAX_LEN[2] * BITS_PER_DIGIT[2],
                    16: ARITY_MAX_LEN[16] * BITS_PER_DIGIT[16]}


def _make_kernel(arity: int, maxlen: int | None = None, stages: int = 3):
    """stages: profiling ablation — 1: table lookup only, 2: + merge
    tree, 3: full (+ wire-byte conversion).  Stages < 3 write truncated
    garbage to the byte output (consumed so Mosaic cannot DCE the
    measured work); only stage 3 is wire-correct."""
    sched, Wf = _levels(arity, maxlen)
    C = CHUNK_SYMS
    bpd = BITS_PER_DIGIT[arity]
    D = ARITY_DIGITS_PER_BYTE[arity]
    cap_digits = _cap_digits(C, arity)
    MB = cap_digits // D  # wire bytes per chunk
    sh = PACKED_LEN_SHIFT.get(arity)

    def kernel(usyms_ref, upacked_ref, ubits_ref, meta_ref, syms_ref,
               bytes_ref, nbytes_ref):
        s = syms_ref[0].astype(jnp.int32)  # [C, 128]
        K = meta_ref[0, 0, 0]
        raw_len = meta_ref[0, 0, 1]

        # Used-symbol lookup: the dominant stage.  Unrolled x8 (host
        # pads the list with a never-matching sentinel) to amortize
        # loop overhead; one packed select per entry when it fits.
        if sh is not None:
            def body(k8, p):
                base = k8 * LOOKUP_UNROLL
                for u in range(LOOKUP_UNROLL):
                    p = jnp.where(s == usyms_ref[0, 0, base + u],
                                  upacked_ref[0, 0, base + u], p)
                return p

            p = jax.lax.fori_loop(
                0, (K + LOOKUP_UNROLL - 1) // LOOKUP_UNROLL, body,
                jnp.zeros((C, LANES), jnp.int32))
            l = jax.lax.shift_right_logical(p, sh) * bpd  # digits -> bits
            w = p & ((1 << sh) - 1)
        else:
            def body(k8, carry):
                w, l = carry
                base = k8 * LOOKUP_UNROLL
                for u in range(LOOKUP_UNROLL):
                    m = s == usyms_ref[0, 0, base + u]
                    w = jnp.where(m, upacked_ref[0, 0, base + u], w)
                    l = jnp.where(m, ubits_ref[0, 0, base + u], l)
                return (w, l)

            w0 = jnp.zeros((C, LANES), jnp.int32)
            l0 = jnp.zeros((C, LANES), jnp.int32)
            w, l = jax.lax.fori_loop(
                0, (K + LOOKUP_UNROLL - 1) // LOOKUP_UNROLL, body, (w0, l0))

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
        # wire-byte conversion in VMEM (was an 18 ms XLA pass)
        if arity == 3:
            # 2-bit fields -> trits -> 5 trits per byte.  Segmented
            # (60 words = 960 trits = 192 bytes per pass; LCM-aligned:
            # 5 words = 80 trits = 16 bytes) so the expanded trit
            # temporaries stay <1 MB — the whole-buffer expansion
            # overflows the 16 MB VMEM scoped stack.
            SEGW = 60
            nb = SEGW * 16 // 5
            for g in range(Wf // SEGW):
                seg = jax.lax.slice(buf, (g * SEGW, 0), ((g + 1) * SEGW, LANES))
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
            byts = jnp.stack(
                [jax.lax.shift_right_logical(buf, 8 * k) & 0xFF for k in range(4)],
                axis=1,
            ).reshape(Wf * 4, LANES)[:MB]
            bytes_ref[0] = byts.astype(jnp.uint8)
        nbytes_ref[0] = lens // bpd  # total digits; bytes derived outside

    return kernel, Wf, MB


@functools.partial(
    jax.jit, static_argnames=("arity", "interpret", "maxlen", "stages")
)
def _encode_pallas(
    syms_t: jnp.ndarray,  # [B, C, 128] uint8/int32 (symbol-major)
    usyms: jnp.ndarray,  # [B, 256] int32 (pad 0x1FF)
    upacked: jnp.ndarray,  # [B, 256] int32
    ubits: jnp.ndarray,  # [B, 256] int32
    meta: jnp.ndarray,  # [B, 2] int32: used_count, raw_len
    *,
    arity: int,
    interpret: bool = False,
    maxlen: int | None = None,
    stages: int = 3,
):
    B = syms_t.shape[0]
    kernel, Wf, MB = _make_kernel(arity, maxlen, stages)
    C = CHUNK_SYMS
    usyms = usyms[:, None, :]
    upacked = upacked[:, None, :]
    ubits = ubits[:, None, :]
    meta = meta[:, None, :]
    byts, nbytes = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
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
    )(usyms, upacked, ubits, meta, syms_t)
    return byts, nbytes


def prep_tables(tables: List[CanonicalTable]) -> Tuple[np.ndarray, ...]:
    """Host-side: per-block used-symbol lists for the SMEM select loop."""
    B = len(tables)
    usyms = np.full((B, 256), 0x1FF, np.int32)  # never matches a byte
    upacked = np.zeros((B, 256), np.int32)
    ubits = np.zeros((B, 256), np.int32)
    count = np.zeros((B,), np.int32)
    cache = {}
    for i, t in enumerate(tables):
        key = id(t)
        if key not in cache:
            pt, bt = pack_encode_table(t)
            used = np.flatnonzero(bt > 0)
            cache[key] = (used, pt, bt)
        used, pt, bt = cache[key]
        usyms[i, : used.size] = used
        upacked[i, : used.size] = pt[used].astype(np.int32)
        ubits[i, : used.size] = bt[used]
        count[i] = used.size
    return usyms, upacked, ubits, count


def encode_blocks_pallas(
    blocks: jnp.ndarray,  # [B, 65536] uint8
    raw_lens: np.ndarray,  # [B]
    tables: List[CanonicalTable],
    arity: int,
    interpret: bool = False,
):
    """-> (wire bytes [B*128, max_chunk_bytes], nbytes [B*128]) —
    wire-identical to encode_chunks_fast with chunk_syms=512."""
    B, S = blocks.shape
    C = CHUNK_SYMS
    assert S == C * LANES, "pallas encoder requires 64 KiB blocks"
    bpd = BITS_PER_DIGIT[arity]
    D = ARITY_DIGITS_PER_BYTE[arity]
    cap_digits = _cap_digits(C, arity)

    usyms, upacked, ubits, count = prep_tables(tables)
    sh = PACKED_LEN_SHIFT.get(arity)
    if sh is not None:
        # pack digit count, not bit count (bit count overflows the
        # field above the 28-bit code at n=16 — see PACKED_LEN_SHIFT)
        udigits = ubits.astype(np.int64) // bpd
        assert int(udigits.max(initial=0)) * bpd <= sh
        upacked = ((udigits << sh) | upacked.astype(np.int64)).astype(np.int32)
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
        jnp.asarray(usyms),
        jnp.asarray(upacked),
        jnp.asarray(ubits),
        jnp.asarray(meta),
        arity=arity,
        interpret=interpret,
        maxlen=maxlen,
    )
    # [B, MB, 128] u8 -> [B*128, MB] (chunk-major wire payloads)
    out = jnp.transpose(byts, (0, 2, 1)).reshape(B * LANES, -1)
    total_digits = jnp.transpose(nbytes, (0, 2, 1)).reshape(B * LANES)
    nbytes = -(-total_digits // D)
    return out, nbytes, total_digits
