"""Pallas TPU kernel: fused digit-parallel Huffman decode (n = 2).

Eight 64 KiB blocks per grid cell in a DIGIT-MAJOR layout: every array
row group (digit j, block b) keeps the serial boundary walk's state at
[8, 128] — one op per step covers 8 blocks x 128 chunks, so the walk
(the only inherently sequential stage, n_ary_huffman.c has the same
seriality in its bit cursor) costs ~1 op per digit per 8 blocks instead
of per 1.  Stages, fusing ops/decode_fast.py's formulation in VMEM:

  1/2/3. per 512-digit segment: payload bytes -> bit digits (digit-
     major interleave via an axis-1 stack) -> sliding 15-bit window
     values (Horner over contiguous row-offset slices) -> per-position
     code length and canonical rank (compares/selects against per-block
     VMEM table columns); (len-1) << 9 | (rank & 0xFF) + 1 lands in an
     int16 scratch.  Ranks clamp to 8 bits so garbage at pad positions
     cannot spill past their item field in the merge.
  4. boundary walk over digit steps, state [8, 128]: dist==0 marks a
     codeword boundary; items (rank+1, else 0) overwrite the scratch in
     place.  No symbol-count guard: spurious boundaries only arise in a
     chunk's zero-pad tail, whose output slots reassembly discards.
  5. compaction: each segment's (4096 = 512 digits x 8 blocks) items
     become 0/8-bit fields in the encoder's scatter-free merge tree
     (ops/pallas/encode_kernel._mshl).  The tree stops at P = 8: level
     <= 9 pair groups span 2^l <= 512 digits and never cross a block
     boundary, so the surviving 8 nodes are exactly the per-block
     segment buffers.  Segments fold into a running per-block
     accumulator with one multiword merge each.
  6. rank -> symbol via a select loop over per-block VMEM symbol
     columns, bounded by the cell's max used-symbol count, unrolled x8.

Work is phased (2 segments per phase) so the int16 scratch stays at
2 MB and peak VMEM ~11 MB.  Bit-exact with decode_chunks_fast
(interpret-mode tests) and against the encoder on chip.
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
G8 = 8  # blocks per grid cell
PH_SEG = 2  # segments per phase (scratch = PH_SEG*SEG*8 rows of int16)
WALK_BLK = 8  # digit steps per walk loop iteration

_SEG_OUT_BITS = C * 8  # per-block output capacity in bits (4096)
_SEG_WF = _SEG_OUT_BITS // 32  # 128 words per block


def _seg_merge_sched():
    """Merge-tree schedule for one segment: 512 digit items per block
    down to one node per block.  The block dimension rides along as an
    explicit axis so pairs always combine adjacent DIGITS of the same
    block (items are digit-major: row = digit * 8 + block)."""
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


SUB = 256  # digits per stage-1/3 sub-segment (bounds live temporaries)


def _digits_for_subseg(payload_ref, h):
    """payload rows (byte m, block b) -> digit-major bits.

    Returns [(SUB + 16) * 8, 128] int32 rows (digit j, block b) starting
    at digit h*SUB; 16 digits of lookahead cover the L=15 window."""
    row0 = h * (SUB // 8)
    nrows = SUB // 8 + 2  # +2 byte rows cover the lookahead
    take = min(row0 + nrows, MBP) - row0
    rows = payload_ref[pl.ds(row0 * G8, take * G8), :].astype(jnp.int32)
    if take < nrows:
        rows = jnp.concatenate(
            [rows, jnp.zeros(((nrows - take) * G8, LANES), jnp.int32)], axis=0
        )
    rows3 = rows.reshape(nrows, G8, LANES)
    d4 = jnp.stack(
        [jax.lax.shift_right_logical(rows3, k) & 1 for k in range(8)], axis=1
    )  # [nrows, bit, block, LANES]
    return d4.reshape(nrows * 8 * G8, LANES)


def _make_kernel(stages: int = 4):
    """stages: profiling ablation — 1: window/length/rank only,
    2: + boundary walk, 3: + compaction, 4: full (rank->symbol)."""

    def kernel(limit_ref, bmf_ref, syms_ref, meta_ref, payload_ref, out_ref,
               packed_ref, accw_ref, accb_ref):
        _kernel_body(stages, limit_ref, bmf_ref, syms_ref, meta_ref,
                     payload_ref, out_ref, packed_ref, accw_ref, accb_ref)

    return kernel


def _kernel_body(stages, limit_ref, bmf_ref, syms_ref, meta_ref, payload_ref,
                 out_ref, packed_ref, accw_ref, accb_ref):
    pay_ref = payload_ref.at[0]  # [MBP*8, 128] rows (byte, block)

    # per-block table columns, lane-broadcast once: [8, 128] each
    lim8 = [None] * (L + 1)
    bmf8 = [None] * (L + 1)
    for l in range(1, L + 1):
        lim8[l] = jnp.broadcast_to(limit_ref[0, :, l][:, None], (G8, LANES))
        bmf8[l] = jnp.broadcast_to(bmf_ref[0, :, l][:, None], (G8, LANES))

    dist = jnp.zeros((G8, LANES), jnp.int32)
    first_seg = True

    for phase in range(NSEGP // PH_SEG):
        # stages 1-3: fill packed scratch for this phase's segments
        for h4 in range(PH_SEG * SEG // SUB):
            h = phase * (PH_SEG * SEG // SUB) + h4
            d = _digits_for_subseg(pay_ref, h)  # [(SUB+16)*8, 128]
            W = jnp.zeros((SUB * G8, LANES), jnp.int32)
            for k in range(L):
                W = W * 2 + jax.lax.slice(
                    d, (k * G8, 0), (k * G8 + SUB * G8, LANES)
                )
            W3 = W.reshape(SUB, G8, LANES)
            ln = jnp.ones((SUB, G8, LANES), jnp.int32)
            for l in range(1, L):
                ln = ln + (W3 >= lim8[l]).astype(jnp.int32)
            rank = jnp.zeros((SUB, G8, LANES), jnp.int32)
            for l in range(1, L + 1):
                sel = ln == l
                rank = jnp.where(
                    sel,
                    bmf8[l] + jax.lax.shift_right_logical(W3, L - l),
                    rank,
                )
            packed = ((ln - 1) << 9) | ((rank & 0xFF) + 1)
            packed_ref[pl.ds(h4 * SUB * G8, SUB * G8), :] = (
                packed.reshape(SUB * G8, LANES).astype(jnp.int16)
            )

        if stages <= 1:
            continue

        # stage 4: boundary walk, [8,128] state, in-place item rewrite
        def walk(i, dist):
            base = pl.multiple_of(i * WALK_BLK * G8, WALK_BLK * G8)
            blk = packed_ref[pl.ds(base, WALK_BLK * G8), :].astype(jnp.int32)
            outs = []
            for u in range(WALK_BLK):
                row = jax.lax.slice(blk, (u * G8, 0), ((u + 1) * G8, LANES))
                b = dist == 0
                outs.append(jnp.where(b, row & 0x1FF, 0))
                dist = jnp.where(
                    b, jax.lax.shift_right_logical(row, 9), dist - 1
                )
            packed_ref[pl.ds(base, WALK_BLK * G8), :] = jnp.concatenate(
                outs, axis=0
            ).astype(jnp.int16)
            return dist

        dist = jax.lax.fori_loop(0, PH_SEG * SEG // WALK_BLK, walk, dist)

        if stages <= 2:
            continue

        # stage 5: per-segment compaction + fold into the accumulator
        sched = _seg_merge_sched()
        for s4 in range(PH_SEG):
            it = packed_ref[pl.ds(s4 * SEG * G8, SEG * G8), :].astype(jnp.int32)
            # rows are digit-major (digit j, block b): keep the block
            # axis explicit so tree pairs combine digits per block
            words = jnp.maximum(it - 1, 0).reshape(SEG, G8, 1, LANES)
            lw = jnp.where(it > 0, 8, 0).reshape(SEG, G8, LANES)
            for (P, Wc, W2) in sched:
                x = words.reshape(P // 2, 2, G8, Wc, LANES)
                a, b = x[:, 0], x[:, 1]
                ll = lw.reshape(P // 2, 2, G8, LANES)
                la, lb = ll[:, 0], ll[:, 1]
                if W2 > Wc:
                    padw = [(0, 0), (0, 0), (0, W2 - Wc), (0, 0)]
                    a = jnp.pad(a, padw)
                    b = jnp.pad(b, padw)
                words = a | _mshl(b, la[:, :, None, :])
                lw = la + lb
            # words [1, 8, _SEG_WF, 128], lw [1, 8, 128] per-block
            words = words[0]
            lw = lw[0]
            if first_seg:
                accw_ref[:, :] = words.reshape(G8 * _SEG_WF, LANES)
                accb_ref[:, :] = lw
                first_seg = False
            else:
                aw = accw_ref[:, :].reshape(G8, _SEG_WF, LANES)
                ab = accb_ref[:, :]
                merged = aw | _mshl(words, ab[:, None, :])
                accw_ref[:, :] = merged.reshape(G8 * _SEG_WF, LANES)
                accb_ref[:, :] = ab + lw

    if stages <= 2:
        out_ref[0] = jnp.zeros((G8 * C, LANES), jnp.uint8)
        return

    buf = accw_ref[:, :].reshape(G8, _SEG_WF, LANES)  # per-block rank bytes
    rb = jnp.stack(
        [jax.lax.shift_right_logical(buf, 8 * k) & 0xFF for k in range(4)],
        axis=2,
    ).reshape(G8, C, LANES)

    if stages <= 3:
        out_ref[0] = rb.reshape(G8 * C, LANES).astype(jnp.uint8)
        return

    # stage 6: rank -> symbol.  Per block: a select loop over the
    # block's used-symbol count (SMEM scalars; dynamic SMEM indexing is
    # free), unrolled x8 — same per-byte cost as the encoder's lookup.
    outs = []
    for b in range(G8):
        rb_b = rb[b]  # [C, LANES]
        K = meta_ref[0, b, 0]

        def body(r8, out, b=b, rb_b=rb_b):
            base = r8 * 8
            for u in range(8):
                out = jnp.where(
                    rb_b == base + u, syms_ref[0, b, base + u], out
                )
            return out

        outs.append(
            jax.lax.fori_loop(
                0, (K + 7) // 8, body, jnp.zeros((C, LANES), jnp.int32)
            )
        )
    out_ref[0] = jnp.concatenate(outs, axis=0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret", "stages"))
def _decode_pallas(payload_t, limit, bmf, syms, meta, *, interpret=False, stages=4):
    """payload_t: [NC, MBP*8, 128] uint8, rows (byte, block-in-group);
    limit/bmf: [NC, 8, L+1] int32; syms: [NC, 8, 256] int32 (SMEM);
    meta: [NC, 8, 2] int32 (slot 0: per-block used-symbol count).
    Returns [NC, 8*C, 128] uint8 rows (block-in-group, symbol)."""
    NC = payload_t.shape[0]
    return pl.pallas_call(
        _make_kernel(stages),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, G8, L + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G8, L + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G8, 256), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G8, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MBP * G8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G8 * C, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NC, G8 * C, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((PH_SEG * SEG * G8, LANES), jnp.int16),  # packed/items
            pltpu.VMEM((G8 * _SEG_WF, LANES), jnp.int32),  # accumulator words
            pltpu.VMEM((G8, LANES), jnp.int32),  # accumulator bit counts
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(limit, bmf, syms, meta, payload_t)


def prep_decode_inputs(payloads_by_block, tables):
    """Host packing: ragged chunk payloads + per-block tables -> the
    kernel's cell-grouped device arrays (payload_t, limit, bmf, syms,
    meta).  Blocks pad to a multiple of 8 with empty cells."""
    B = len(payloads_by_block)
    NC = -(-B // G8)  # grid cells; tail cell padded with empty blocks
    BP = NC * G8
    # vectorized ragged->padded packing: boolean-mask assignment fills
    # row-major, i.e. exactly concatenation order
    nb = np.zeros(BP * LANES, np.int64)
    for b, chunks in enumerate(payloads_by_block):
        for c, ch in enumerate(chunks):
            nb[b * LANES + c] = len(ch)
    flat = np.frombuffer(
        b"".join(ch for chunks in payloads_by_block for ch in chunks), np.uint8
    )
    pay = np.zeros((BP * LANES, MBP), np.uint8)
    pay[np.arange(MBP)[None, :] < nb[:, None]] = flat
    # [BP, LANES, MBP] -> cells x (byte, block-in-group) x lanes
    payload_t = jnp.asarray(
        np.ascontiguousarray(
            pay.reshape(NC, G8, LANES, MBP).transpose(0, 3, 1, 2)
        ).reshape(NC, MBP * G8, LANES)
    )

    limit = np.zeros((NC, G8, L + 1), np.int32)
    bmf = np.zeros((NC, G8, L + 1), np.int32)
    syms = np.zeros((NC, G8, 256), np.int32)
    used = np.zeros(BP, np.int32)
    cache = {}
    for b, t in enumerate(tables):
        if id(t) not in cache:
            cache[id(t)] = build_decode_tables(t, pad_to=L)
        d = cache[id(t)]
        limit[b // G8, b % G8] = d["limit_scaled"]
        bmf[b // G8, b % G8] = d["base_minus_first"]
        syms[b // G8, b % G8] = d["symbols"]
        used[b] = t.sorted_symbols.size
    meta = np.zeros((NC, G8, 2), np.int32)
    meta[:, :, 0] = used.reshape(NC, G8)
    return (
        payload_t,
        jnp.asarray(limit),
        jnp.asarray(bmf),
        jnp.asarray(syms),
        jnp.asarray(meta),
    )


def decode_blocks_pallas(
    payloads_by_block,  # list of lists of chunk payload bytes, per block
    raw_lens,
    tables,
    interpret: bool = False,
):
    """-> list of per-block decoded bytes (n=2, 64 KiB blocks)."""
    B = len(payloads_by_block)
    args = prep_decode_inputs(payloads_by_block, tables)
    out = _decode_pallas(*args, interpret=interpret)
    # [NC, 8*C, 128] rows (block, symbol) -> per-block chunk-major bytes
    out = np.asarray(out).reshape(-1, C, LANES).transpose(0, 2, 1)
    return [
        out[b].reshape(-1)[: int(raw_lens[b])].tobytes() for b in range(B)
    ]
