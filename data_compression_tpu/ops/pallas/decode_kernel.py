"""Pallas TPU kernel: fused digit-parallel Huffman decode (n = 2).

Same chunk-per-lane layout as the encode kernel (one 64 KiB block per
grid cell, 128 chunks x 512 symbols, chunk index in the lane
dimension), fusing ops/decode_fast.py's stages in VMEM.  The digit
stream (7680 positions per chunk) is processed in SEGMENTS of 1024 so
peak VMEM stays ~3 MB (a whole-stream formulation needs ~75 MB):

  1/2/3. per segment: payload bytes -> bit digits -> sliding 15-bit
     window values (Horner over static sublane shifts) -> per-position
     code length l(j) (compares against SMEM scaled limits) and
     canonical rank(j) (shift, not divide — binary digits); l and rank
     land in narrow VMEM scratches (int8/uint8);
  4. boundary walk: fori over digit rows, one distance counter and one
     boundary counter per lane (bounds chunk c at
     clip(raw_len - c*C, 0, C) symbols);
  5. compaction: per segment, boundary ranks become 0/8-bit items in a
     lane-local merge tree (10 levels); the 8 segment buffers then
     merge in 3 more levels — exactly the encoder's machinery;
  6. rank -> symbol via a select loop over the canonical symbol list.

Bit-exact with decode_chunks_fast (interpret-mode tests) and verified
against the encoder on chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from data_compression_tpu.config import ARITY_MAX_LEN
from data_compression_tpu.huffman.canonical import build_decode_tables
from data_compression_tpu.ops.huffman_coding import _cap_digits, max_chunk_bytes
from data_compression_tpu.ops.pallas.encode_kernel import (
    CHUNK_SYMS,
    LANES,
    _mshl,
)

ARITY = 2
L = ARITY_MAX_LEN[2]  # 15
C = CHUNK_SYMS  # 512
CAP = _cap_digits(C, 2)  # 7680 digits
MB = max_chunk_bytes(C, 2)  # 960 payload bytes per chunk
SEG = 512  # digits per segment (= 64 payload bytes)
CAPP = 8192  # padded digit capacity (payload padded to 1024 bytes)
MBP = CAPP // 8  # 1024 padded payload bytes
NSEGP = CAPP // SEG  # 16
WALK_UNROLL = 8

# per-segment compaction: SEG items of 0/8 bits -> up to C*8 bits
_SEG_OUT_BITS = C * 8  # 4096
_SEG_WF = _SEG_OUT_BITS // 32  # 128 words


def _seg_merge_sched():
    sched = []
    P, W = SEG, 1
    level = 0
    while P > 1:
        level += 1
        need = min((1 << level) * 8, _SEG_OUT_BITS)
        W2 = min(-(-need // 32), _SEG_WF)
        sched.append((P, W, W2))
        P //= 2
        W = W2
    return sched


def _digits_for_segment(pay, s):
    """pay [MBP, 128] int32; returns [SEG + L, 128] bits starting at
    digit s*SEG (L lookahead, zero-padded past the end)."""
    row0 = s * (SEG // 8)
    nrows = SEG // 8 + 2  # +2 byte rows covers L=15 lookahead bits
    rows = jax.lax.slice(pay, (row0, 0), (min(row0 + nrows, MBP), LANES))
    if row0 + nrows > MBP:
        rows = jnp.concatenate(
            [rows, jnp.zeros((row0 + nrows - MBP, LANES), jnp.int32)], axis=0
        )
    bits = jnp.stack(
        [jax.lax.shift_right_logical(rows, k) & 1 for k in range(8)], axis=1
    ).reshape(nrows * 8, LANES)
    return bits[: SEG + L + 1]


def _make_kernel(stages: int = 4):
    """stages: profiling ablation — 1: window/length/rank only,
    2: + boundary walk, 3: + compaction, 4: full (rank->symbol)."""

    def kernel(limit_ref, bmf_ref, syms_ref, meta_ref, payload_ref, out_ref,
               ln_scratch, item_scratch, seg_words_ref, seg_bits_ref):
        _kernel_body(stages, limit_ref, bmf_ref, syms_ref, meta_ref,
                     payload_ref, out_ref, ln_scratch, item_scratch,
                     seg_words_ref, seg_bits_ref)

    return kernel


def _kernel_body(stages, limit_ref, bmf_ref, syms_ref, meta_ref, payload_ref,
                 out_ref, ln_scratch, item_scratch, seg_words_ref, seg_bits_ref):
    pay = payload_ref[0].astype(jnp.int32)  # [MBP, 128]

    # passes 1-3, segment by segment.  ln_scratch holds (code length -
    # 1) and item_scratch (rank & 0xFF) + 1 — exactly the values the
    # walk emits, so the walk body stays at 4 ops per digit.  The &0xFF
    # clamp keeps garbage ranks at pad positions from spilling past
    # their 8-bit item field in the compaction merge; real ranks are
    # < 256 by Kraft.
    for s in range(NSEGP):
        d = _digits_for_segment(pay, s)  # [SEG+L+1, 128]
        W = jnp.zeros((SEG, LANES), jnp.int32)
        for k in range(L):
            W = W * 2 + jax.lax.slice(d, (k, 0), (k + SEG, LANES))
        ln = jnp.ones((SEG, LANES), jnp.int32)
        for l in range(1, L):
            ln = ln + (W >= limit_ref[0, 0, l]).astype(jnp.int32)
        rank = jnp.zeros((SEG, LANES), jnp.int32)
        for l in range(1, L + 1):
            sel = ln == l
            rank = jnp.where(
                sel,
                bmf_ref[0, 0, l] + jax.lax.shift_right_logical(W, L - l),
                rank,
            )
        ln_scratch[pl.ds(s * SEG, SEG), :] = ln - 1
        item_scratch[pl.ds(s * SEG, SEG), :] = (rank & 0xFF) + 1

    if stages <= 1:
        out_ref[0] = jnp.zeros((C, LANES), jnp.uint8)
        return

    # pass 4: boundary walk; rewrites item_scratch rows in place to
    # rank+1 at codeword boundaries, 0 elsewhere.  No symbol-count
    # guard: spurious boundaries can only arise in the zero-pad digits
    # AFTER a chunk's last real codeword, so their items land in output
    # slots past the chunk's symbol count, which reassembly discards
    # (decode_blocks_pallas truncates each block to raw_len).
    BLK = 8

    def walk(i, dist):
        base = pl.multiple_of(i * BLK, BLK)
        lblk = ln_scratch[pl.ds(base, BLK), :]  # len-1 rows
        rblk = item_scratch[pl.ds(base, BLK), :]  # rank+1 rows
        rows = []
        for u in range(BLK):
            row_l = jax.lax.slice(lblk, (u, 0), (u + 1, LANES))
            row_r = jax.lax.slice(rblk, (u, 0), (u + 1, LANES))
            b = dist == 0
            rows.append(jnp.where(b, row_r, 0))
            dist = jnp.where(b, row_l, dist - 1)
        item_scratch[pl.ds(base, BLK), :] = jnp.concatenate(rows, axis=0)
        return dist

    jax.lax.fori_loop(
        0, CAPP // BLK, walk, jnp.zeros((1, LANES), jnp.int32)
    )

    if stages <= 2:
        out_ref[0] = jnp.zeros((C, LANES), jnp.uint8)
        return

    # pass 5a: per-segment compaction
    sched = _seg_merge_sched()
    for s in range(NSEGP):
        it = item_scratch[pl.ds(s * SEG, SEG), :]
        words = jnp.maximum(it - 1, 0)[:, None, :]
        lw = jnp.where(it > 0, 8, 0)
        for (P, Wc, W2) in sched:
            x = words.reshape(P // 2, 2, Wc, LANES)
            a, b = x[:, 0], x[:, 1]
            ll = lw.reshape(P // 2, 2, LANES)
            la, lb = ll[:, 0], ll[:, 1]
            if W2 > Wc:
                padw = [(0, 0), (0, W2 - Wc), (0, 0)]
                a = jnp.pad(a, padw)
                b = jnp.pad(b, padw)
            words = a | _mshl(b, la[:, None, :])
            lw = la + lb
        seg_words_ref[pl.ds(s * _SEG_WF, _SEG_WF), :] = words[0]
        seg_bits_ref[pl.ds(s, 1), :] = lw

    # pass 5b: merge the NSEGP segment buffers (3 levels)
    words = seg_words_ref[:, :].reshape(NSEGP, _SEG_WF, LANES)
    lw = seg_bits_ref[:, :]
    P = NSEGP
    while P > 1:
        x = words.reshape(P // 2, 2, _SEG_WF, LANES)
        a, b = x[:, 0], x[:, 1]
        ll = lw.reshape(P // 2, 2, LANES)
        la, lb = ll[:, 0], ll[:, 1]
        words = a | _mshl(b, la[:, None, :])
        lw = la + lb
        P //= 2
    buf = words[0]  # [_SEG_WF, 128]: C rank bytes per lane

    rb = jnp.stack(
        [jax.lax.shift_right_logical(buf, 8 * k) & 0xFF for k in range(4)], axis=1
    ).reshape(C, LANES)

    if stages <= 3:
        out_ref[0] = rb.astype(jnp.uint8)
        return

    # pass 6: rank -> symbol, bounded by the table's used-symbol count
    # (meta slot 1) and unrolled x8; real slots always carry rank < S,
    # so the iterations past S only touch discarded garbage slots.
    S_used = meta_ref[0, 0, 1]
    out = jnp.zeros((C, LANES), jnp.int32)

    def body(r8, out):
        base = r8 * 8
        for u in range(8):
            out = jnp.where(rb == base + u, syms_ref[0, 0, base + u], out)
        return out

    out = jax.lax.fori_loop(0, (S_used + 7) // 8, body, out)
    out_ref[0] = out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret", "stages"))
def _decode_pallas(payload_t, limit, bmf, syms, meta, *, interpret=False, stages=4):
    B = payload_t.shape[0]
    return pl.pallas_call(
        _make_kernel(stages),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, L + 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L + 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MBP, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((CAPP, LANES), jnp.int32),  # ln
            pltpu.VMEM((CAPP, LANES), jnp.int32),  # rank -> items (in place)
            pltpu.VMEM((NSEGP * _SEG_WF, LANES), jnp.int32),  # segment words
            pltpu.VMEM((NSEGP, LANES), jnp.int32),  # segment bit counts
        ],
        interpret=interpret,
    )(limit, bmf, syms, meta, payload_t)


def decode_blocks_pallas(
    payloads_by_block,  # list of lists of chunk payload bytes, per block
    raw_lens,
    tables,
    interpret: bool = False,
):
    """-> list of per-block decoded bytes (n=2, 64 KiB blocks)."""
    B = len(payloads_by_block)
    # vectorized ragged->padded packing: boolean-mask assignment fills
    # row-major, i.e. exactly concatenation order
    nb = np.zeros(B * LANES, np.int64)
    for b, chunks in enumerate(payloads_by_block):
        for c, ch in enumerate(chunks):
            nb[b * LANES + c] = len(ch)
    flat = np.frombuffer(
        b"".join(ch for chunks in payloads_by_block for ch in chunks), np.uint8
    )
    pay = np.zeros((B * LANES, MBP), np.uint8)
    pay[np.arange(MBP)[None, :] < nb[:, None]] = flat
    payload_t = jnp.transpose(
        jnp.asarray(pay.reshape(B, LANES, MBP)), (0, 2, 1)
    )  # [B, MBP, 128]

    limit = np.zeros((B, 1, L + 1), np.int32)
    bmf = np.zeros((B, 1, L + 1), np.int32)
    syms = np.zeros((B, 1, 256), np.int32)
    used = np.zeros(B, np.int32)
    cache = {}
    for b, t in enumerate(tables):
        if id(t) not in cache:
            cache[id(t)] = build_decode_tables(t, pad_to=L)
        d = cache[id(t)]
        limit[b, 0] = d["limit_scaled"]
        bmf[b, 0] = d["base_minus_first"]
        syms[b, 0] = d["symbols"]
        used[b] = t.sorted_symbols.size
    meta = np.zeros((B, 1, 2), np.int32)
    meta[:, 0, 0] = np.asarray(raw_lens, np.int32)
    meta[:, 0, 1] = used

    out = _decode_pallas(
        payload_t,
        jnp.asarray(limit),
        jnp.asarray(bmf),
        jnp.asarray(syms),
        jnp.asarray(meta),
        interpret=interpret,
    )
    out = np.asarray(jnp.transpose(out, (0, 2, 1)))  # [B, 128, C] u8
    return [
        out[b].reshape(-1)[: int(raw_lens[b])].tobytes() for b in range(B)
    ]
