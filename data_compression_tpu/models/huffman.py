"""n-ary canonical Huffman codec (n = 2, 3, 16).

The reference's north-star scheme (n_ary_huffman.c).  Table
construction follows the reference exactly (huffman/tree.py,
huffman/canonical.py — parity-tested against n_ary_huffman.c:2821-2891);
the bitstream is our own TPU-native design because the reference's
emission is stubbed (``assert(0)`` at n_ary_huffman.c:1661,:1786 — it
never produced a stream).

Block payload layout (all little-endian):

  u8   table_mode      0 = inline table, 1 = stream-shared table
  [inline only] u8[256] canonical length per symbol (the same
        information the reference's '\\nX' header carries,
        n_ary_huffman.c:1736-1741)
  u16  num_chunks
  u16  chunk_bytes[num_chunks]
  chunk payloads, each byte-aligned (digits packed per
        config.ARITY_DIGITS_PER_BYTE: 8 bits / 5 trits / 2 nybbles)

Chunks are ``chunk_syms`` consecutive symbols; per-chunk byte lengths
make decode embarrassingly parallel (the design the reference sketches
at small_compression.c:924-927).  Device encode/decode paths live in
ops/huffman_coding.py; the numpy host path below is the bit-exact
oracle used by differential tests.
"""

from __future__ import annotations

import logging
import struct
from typing import List, Optional, Tuple

import numpy as np

from data_compression_tpu.config import (
    ARITY_DIGITS_PER_BYTE,
    ARITY_MAX_LEN,
    FAST_ARITIES,
)
from data_compression_tpu.huffman.canonical import (
    CanonicalTable,
    build_decode_tables,
    lengths_to_codes,
)
from data_compression_tpu.huffman.tree import huffman_lengths
from data_compression_tpu.models.base import Codec, EncodeResult


_log = logging.getLogger("data_compression_tpu")
_fallback_warned: set = set()


def _note_pallas_fallback(kind: str, reasons: List[str]) -> None:
    """Loud fallback: when ``use_pallas=True`` but the fused kernel's
    preconditions don't hold, say so ONCE per distinct reason set — a
    user benchmarking an unsupported config must not mistake the XLA
    path's number for the advertised kernel's."""
    key = (kind, tuple(reasons))
    if key in _fallback_warned:
        return
    _fallback_warned.add(key)
    msg = (
        f"pallas {kind} fast path unavailable ({'; '.join(reasons)}); "
        "falling back to the XLA path (several x slower)"
    )
    if reasons == ["backend is not tpu"]:
        _log.info(msg)  # expected off-TPU; don't spam test/CPU runs
    else:
        _log.warning(msg)


def capped_lengths(freqs: np.ndarray, arity: int) -> np.ndarray:
    """Huffman lengths under the per-arity cap; frequencies are halved
    (flattened) until the optimal tree fits, the standard rescaling
    fallback. In practice 64 KiB blocks never need it for n=2/3."""
    cap = ARITY_MAX_LEN[arity]
    freqs = np.asarray(freqs, np.int64)
    while True:
        lengths = huffman_lengths(freqs, arity, max_len=64)
        if lengths.max(initial=0) <= cap:
            return lengths
        freqs = np.where(freqs > 0, (freqs + 1) // 2, 0)


# ----------------------------------------------------------------------
# Host (numpy) oracle paths — bit-exact with ops/huffman_coding.py
# ----------------------------------------------------------------------


def encode_chunk_np(syms: np.ndarray, table: CanonicalTable) -> bytes:
    n = table.arity
    D = ARITY_DIGITS_PER_BYTE[n]
    digits: List[int] = []
    for s in syms:
        code = int(table.codes[s])
        ln = int(table.lengths[s])
        assert ln > 0, f"symbol {s} has no code"
        for p in range(ln - 1, -1, -1):
            digits.append((code // n**p) % n)
    while len(digits) % D:
        digits.append(0)
    out = bytearray()
    for k in range(0, len(digits), D):
        b = 0
        for d in range(D):
            b += digits[k + d] * n**d
        out.append(b)
    return bytes(out)


def decode_chunk_np(payload: bytes, count: int, table: CanonicalTable) -> np.ndarray:
    n = table.arity
    D = ARITY_DIGITS_PER_BYTE[n]
    digits: List[int] = []
    for b in payload:
        for d in range(D):
            digits.append((b // n**d) % n)
    out = np.empty(count, np.uint8)
    off = 0
    for i in range(count):
        value = 0
        ln = 0
        while True:
            ln += 1
            if off + ln > len(digits):
                raise ValueError("truncated huffman chunk")
            value = value * n + digits[off + ln - 1]
            if ln >= len(table.first_code):
                cnt = 0
            else:
                cnt = int(table.count[ln]) if ln < table.count.shape[0] else 0
            if cnt and table.first_code[ln] <= value < table.first_code[ln] + cnt:
                break
            if ln > table.max_len:
                raise ValueError("invalid huffman stream")
        sidx = int(table.base_index[ln]) + value - int(table.first_code[ln])
        out[i] = table.sorted_symbols[sidx]
        off += ln
    return out


# ----------------------------------------------------------------------
# Payload assembly
# ----------------------------------------------------------------------


def _pack_payload(
    table_bytes: Optional[bytes], chunk_payloads: List[bytes]
) -> bytes:
    parts = []
    if table_bytes is None:
        parts.append(b"\x01")
    else:
        parts.append(b"\x00")
        assert len(table_bytes) == 256
        parts.append(table_bytes)
    parts.append(struct.pack("<H", len(chunk_payloads)))
    parts.append(
        struct.pack(f"<{len(chunk_payloads)}H", *[len(c) for c in chunk_payloads])
    )
    parts.extend(chunk_payloads)
    return b"".join(parts)


def _unpack_payload(payload: bytes) -> Tuple[Optional[bytes], List[bytes]]:
    # All parse failures must surface as ValueError (the fuzz contract:
    # corruption is detected cleanly) — a bit-flipped chunk count could
    # otherwise make struct.unpack_from read past the buffer and raise
    # struct.error (ADVICE r3).
    if not payload:
        raise ValueError("empty huffman payload")
    mode = payload[0]
    off = 1
    table_bytes = None
    if mode == 0:
        table_bytes = payload[1:257]
        if len(table_bytes) != 256:
            raise ValueError("truncated huffman payload (table)")
        off = 257
    elif mode != 1:
        raise ValueError(f"bad huffman table mode {mode}")
    if off + 2 > len(payload):
        raise ValueError("truncated huffman payload (chunk count)")
    (nc,) = struct.unpack_from("<H", payload, off)
    off += 2
    if off + 2 * nc > len(payload):
        raise ValueError("truncated huffman payload (chunk lengths)")
    lens = struct.unpack_from(f"<{nc}H", payload, off)
    off += 2 * nc
    chunks = []
    for ln in lens:
        chunks.append(payload[off : off + ln])
        if len(chunks[-1]) != ln:
            raise ValueError("truncated huffman payload")
        off += ln
    return table_bytes, chunks


# ----------------------------------------------------------------------
# Codec
# ----------------------------------------------------------------------


class HuffmanCodec(Codec):
    name = "huffman"

    def _chunk_counts(self, raw_len: int) -> List[int]:
        C = self.config.chunk_syms
        nc = max(1, -(-raw_len // C))
        return [max(0, min(C, raw_len - c * C)) for c in range(nc)]

    # -------------------------- encode --------------------------------

    def encode_blocks(self, blocks: np.ndarray, lengths: np.ndarray) -> EncodeResult:
        B = blocks.shape[0]
        if B == 0:
            return EncodeResult(payloads=[], shared_table=None)
        arity = self.config.arity

        # Histograms: device-parallel, host fallback for tiny batches.
        if self.config.use_device:
            from data_compression_tpu.ops.histogram import block_histograms
            import jax.numpy as jnp

            hists = np.asarray(
                block_histograms(jnp.asarray(blocks), jnp.asarray(lengths))
            ).astype(np.int64)
        else:
            hists = np.stack(
                [
                    np.bincount(blocks[i, : int(lengths[i])], minlength=256)
                    for i in range(B)
                ]
            ).astype(np.int64)

        shared_table_bytes = None
        if self.config.shared_table:
            lengths_tab = capped_lengths(hists.sum(axis=0), arity)
            tables = [lengths_to_codes(lengths_tab, arity)] * B
            shared_table_bytes = tables[0].to_bytes()
        else:
            tables = [
                lengths_to_codes(capped_lengths(hists[i], arity), arity)
                for i in range(B)
            ]

        # Generic arities (the reference's 9/10-ary experiments,
        # n_ary_huffman.c:1161-1208) have no bit-field wire packing, so
        # they ride the digit-generic host path regardless of
        # use_device; 2/3/16 get the device/native fast paths.
        if self.config.use_device and arity in FAST_ARITIES:
            chunk_payloads = self._encode_device(blocks, lengths, tables)
        else:
            chunk_payloads = self._encode_host(blocks, lengths, tables)

        payloads = []
        for i in range(B):
            tb = None if self.config.shared_table else tables[i].to_bytes()
            payloads.append(_pack_payload(tb, chunk_payloads[i]))
        return EncodeResult(payloads=payloads, shared_table=shared_table_bytes)

    def _encode_host(self, blocks, lengths, tables) -> List[List[bytes]]:
        from data_compression_tpu import native
        from data_compression_tpu.ops.encode_fast import pack_encode_table

        use_native = (
            native.load() is not None and self.config.arity in FAST_ARITIES
        )
        packed_cache = {}

        def _pk(t):
            if id(t) not in packed_cache:
                packed_cache[id(t)] = pack_encode_table(t)
            return packed_cache[id(t)]

        out = []
        C = self.config.chunk_syms
        for i in range(blocks.shape[0]):
            raw = blocks[i, : int(lengths[i])]
            chunks = []
            for c, cnt in enumerate(self._chunk_counts(int(lengths[i]))):
                seg = raw[c * C : c * C + cnt]
                if use_native:
                    pt, bt = _pk(tables[i])
                    chunks.append(
                        native.huffman_encode_chunk(seg, pt, bt, self.config.arity)
                    )
                else:
                    chunks.append(encode_chunk_np(seg, tables[i]))
            out.append(chunks)
        return out

    def _encode_device(self, blocks, lengths, tables) -> List[List[bytes]]:
        import jax
        import jax.numpy as jnp

        from data_compression_tpu.ops.encode_fast import (
            encode_chunks_fast,
            pack_encode_table,
        )

        B, S = blocks.shape
        C = self.config.chunk_syms
        arity = self.config.arity

        from data_compression_tpu.ops.pallas.encode_kernel import LANES

        # one block = 128 lane-chunks of S/128 symbols: any power-of-two
        # block >= 16 KiB whose chunk_syms matches that geometry
        lane_c = S // LANES
        pallas_ok = (
            jax.default_backend() == "tpu"
            and S % LANES == 0
            and C == lane_c
            and C >= 128
            and C & (C - 1) == 0
        )
        if self.config.use_pallas and not pallas_ok:
            reasons = []
            if jax.default_backend() != "tpu":
                reasons.append("backend is not tpu")
            if S % LANES or C != lane_c:
                reasons.append(
                    f"chunk_syms {C} != block_size/128 ({S}/{LANES})"
                )
            if C < 128 or C & (C - 1):
                reasons.append(f"chunk_syms {C} not a power of two >= 128")
            _note_pallas_fallback("encode", reasons)
        if self.config.use_pallas and pallas_ok:
            from data_compression_tpu.ops.pallas.encode_kernel import (
                encode_blocks_pallas,
            )

            packed, nbytes, _ = encode_blocks_pallas(
                jnp.asarray(blocks), np.asarray(lengths), tables, arity
            )
            packed = np.asarray(packed)
            nbytes = np.asarray(nbytes)
            ncb = S // C
            out = []
            for i in range(B):
                n_real = len(self._chunk_counts(int(lengths[i])))
                out.append(
                    [
                        packed[i * ncb + c, : int(nbytes[i * ncb + c])].tobytes()
                        for c in range(n_real)
                    ]
                )
            return out
        ncb = S // C  # chunks per (full) block
        syms = blocks.reshape(B * ncb, C)
        counts = np.clip(
            np.asarray(lengths)[:, None] - np.arange(ncb)[None, :] * C, 0, C
        ).reshape(-1)
        tbl_of_chunk = np.repeat(np.arange(B, dtype=np.int32), ncb)
        cache = {}

        def _pk(t):
            if id(t) not in cache:
                cache[id(t)] = pack_encode_table(t)
            return cache[id(t)]

        pt, bt = zip(*[_pk(t) for t in tables])

        packed, nbytes, _ = encode_chunks_fast(
            jnp.asarray(syms),
            jnp.asarray(counts, jnp.int32),
            jnp.asarray(np.stack(pt)),
            jnp.asarray(np.stack(bt)),
            jnp.asarray(tbl_of_chunk),
            arity=arity,
            chunk_syms=C,
        )
        packed = np.asarray(packed)
        nbytes = np.asarray(nbytes)

        out = []
        for i in range(B):
            n_real = len(self._chunk_counts(int(lengths[i])))
            chunks = []
            for c in range(n_real):
                k = i * ncb + c
                chunks.append(packed[k, : int(nbytes[k])].tobytes())
            out.append(chunks)
        return out

    # -------------------------- decode --------------------------------

    def decode_blocks(
        self,
        payloads: List[bytes],
        raw_lens: List[int],
        shared_table: Optional[bytes] = None,
    ) -> List[bytes]:
        if not payloads:
            return []
        arity = self.config.arity
        parsed = [_unpack_payload(p) for p in payloads]
        tables = []
        for (tb, _chunks), _ in zip(parsed, raw_lens):
            if tb is None:
                if shared_table is None:
                    raise ValueError("stream requires shared table but frame has none")
                tables.append(CanonicalTable.from_bytes(shared_table, arity))
            else:
                tables.append(CanonicalTable.from_bytes(tb, arity))

        if self.config.use_device and arity in FAST_ARITIES:
            return self._decode_device(parsed, raw_lens, tables)
        return self._decode_host(parsed, raw_lens, tables)

    def _decode_host(self, parsed, raw_lens, tables) -> List[bytes]:
        from data_compression_tpu import native

        use_native = (
            native.load() is not None and self.config.arity in FAST_ARITIES
        )
        L = ARITY_MAX_LEN[self.config.arity]
        dec_cache = {}

        def _dec(t):
            if id(t) not in dec_cache:
                dec_cache[id(t)] = build_decode_tables(t, pad_to=L)
            return dec_cache[id(t)]

        out = []
        for (tb, chunks), raw_len, table in zip(parsed, raw_lens, tables):
            counts = self._chunk_counts(raw_len)
            if len(chunks) != len(counts):
                raise ValueError("huffman chunk count mismatch")
            if use_native:
                parts = [
                    native.huffman_decode_chunk(
                        ch, cnt, _dec(table), self.config.arity, L
                    )
                    for ch, cnt in zip(chunks, counts)
                ]
            else:
                parts = [
                    decode_chunk_np(ch, cnt, table) for ch, cnt in zip(chunks, counts)
                ]
            out.append(np.concatenate(parts)[:raw_len].tobytes() if parts else b"")
        return out

    def _decode_device(self, parsed, raw_lens, tables) -> List[bytes]:
        import jax
        import jax.numpy as jnp

        from data_compression_tpu.ops.decode_fast import (
            decode_chunks_fast as decode_chunks,
        )
        from data_compression_tpu.ops.huffman_coding import max_chunk_bytes

        C = self.config.chunk_syms
        arity = self.config.arity

        from data_compression_tpu.ops.pallas.decode_kernel import LANES

        S = self.config.block_size
        lane_c = S // LANES
        pallas_ok = (
            jax.default_backend() == "tpu"
            and arity == 2
            and S % LANES == 0
            and C == lane_c
            and C >= 128
            and C & (C - 1) == 0
        )
        if self.config.use_pallas and not pallas_ok:
            reasons = []
            if jax.default_backend() != "tpu":
                reasons.append("backend is not tpu")
            if arity != 2:
                reasons.append(f"arity {arity} != 2")
            if S % LANES or C != lane_c:
                reasons.append(
                    f"chunk_syms {C} != block_size/128 ({S}/{LANES})"
                )
            if C < 128 or C & (C - 1):
                reasons.append(f"chunk_syms {C} not a power of two >= 128")
            _note_pallas_fallback("decode", reasons)
        if self.config.use_pallas and pallas_ok:
            from data_compression_tpu.ops.pallas.decode_kernel import (
                decode_blocks_pallas,
            )

            return decode_blocks_pallas(
                [chunks for (_tb, chunks) in parsed],
                list(raw_lens),
                tables,
                chunk_syms=C,
            )

        mb = max_chunk_bytes(C, arity)

        flat_chunks: List[bytes] = []
        flat_counts: List[int] = []
        flat_tbl: List[int] = []
        spans = []  # (start, nchunks, raw_len)
        for bi, ((tb, chunks), raw_len) in enumerate(zip(parsed, raw_lens)):
            counts = self._chunk_counts(raw_len)
            if len(chunks) != len(counts):
                raise ValueError("huffman chunk count mismatch")
            spans.append((len(flat_chunks), len(chunks), raw_len))
            flat_chunks.extend(chunks)
            flat_counts.extend(counts)
            flat_tbl.extend([bi] * len(chunks))

        N = len(flat_chunks)
        payload_arr = np.zeros((N, mb), np.uint8)
        for k, ch in enumerate(flat_chunks):
            if len(ch) > mb:
                raise ValueError("huffman chunk payload too large")
            payload_arr[k, : len(ch)] = np.frombuffer(ch, np.uint8)

        dec = [build_decode_tables(t, pad_to=ARITY_MAX_LEN[arity]) for t in tables]
        limit = np.stack([d["limit_scaled"] for d in dec]).astype(np.int32)
        bmf = np.stack([d["base_minus_first"] for d in dec]).astype(np.int32)
        symtab = np.stack([d["symbols"] for d in dec]).astype(np.int32)

        syms = decode_chunks(
            jnp.asarray(payload_arr),
            jnp.asarray(np.asarray(flat_counts, np.int32)),
            jnp.asarray(limit),
            jnp.asarray(bmf),
            jnp.asarray(symtab),
            jnp.asarray(np.asarray(flat_tbl, np.int32)),
            arity=arity,
            chunk_syms=C,
        )
        syms = np.asarray(syms)

        out = []
        for start, nc, raw_len in spans:
            if nc == 0:
                out.append(b"")
                continue
            block = syms[start : start + nc].reshape(-1)[:raw_len]
            out.append(block.tobytes())
        return out
