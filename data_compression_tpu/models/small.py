"""Context-keyed LZW "small" codecs (byte and nybble variants).

Reimplements the two schemes of small_compression.c:

Scheme A (``small_byte``, spec at small_compression.c:5-18): each
compressed byte is a word index; 32 contexts keyed on the low 5 bits of
the previous plaintext byte (byte_to_context :74-77); indexes 0x80-0xFE
reference a 127-entry per-context dictionary of
(prefix_word_index, last_letter) chains (:127-135); the decoder rebuilds
the dictionary in lock-step, adding (previous word + first byte of next
word) each step (:473-482).

Scheme B (``small_nybble``): words are nybble strings, low-nybble-first
within a byte (little_endian write_nybble :1192-1215); literal nybbles
live at reserved indexes 0x10-0x1F (:803-805); table[32][256] seeded so
every byte index initially decodes to itself (:783-836); new word
indexes allocate from 0x80 wrapping at 0x100 (increment_table_index
:1330-1384).

The reference's encoder for scheme A is stubbed (its tree search is
commented out, :530-549, leaving a hard-wired space+lowercase rule) and
its LZW special case is ``assert(0)`` (:428).  This module builds the
real codec the comments describe, with three deliberate fixes, each
noted inline:

  1. dictionary slots allocate from the context the entry is stored in
     (the reference draws ``tochange`` from the *current* context's
     counter but stores into the *previous* context's table,
     :480-482 — inconsistent bookkeeping its stubbed encoder never
     exercised);
  2. the LZW special case (cScSc) is implemented per the references the
     author cites (:414-430): the new word's last letter is the first
     letter of the previous word;
  3. the initial previous-context is ``byte_to_context(' ')`` rather
     than the raw byte ``' '`` (the reference indexes
     ``dictionary[32]`` out of bounds on the first update, :468).

Encoder/decoder stay synchronized by construction: the encoder extends
matches by scanning the *live* dictionary (exactly the state the
decoder has), so chain reuse after slot wrap-around can never desync.

Decoder behavior matches the reference on every stream the reference's
own tests exercise (mock-encoder streams; verified in
tests/test_small.py).

Host implementation; the device path (vmapped scan over blocks, linear
127-entry table probes per step) mirrors the nybble codec's strategy in
ops/scan_codecs.py and lands with the block-parallel LZW kernels.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from data_compression_tpu.models.base import Codec, EncodeResult

EIGHT_BIT_PRUNED = 8  # small_compression.c:39
NUM_CONTEXTS = 32
DICT_INDEXES = 0x7F  # 127 word slots per context (scheme A)
MAX_WORD = 256  # chain-walk guard (reference has none; reversed_word[128])


def _ctx(byte: int) -> int:
    return byte & (NUM_CONTEXTS - 1)


# ----------------------------------------------------------------------
# Scheme A: byte-oriented context LZW
# ----------------------------------------------------------------------


class _ByteDict:
    """Per-context (prefix, letter) chain dictionary, decoder state."""

    def __init__(self):
        # initialize_dictionary (small_compression.c:171-196): every
        # slot i decodes as ' ' + chr(i) (i==0 -> 'x').
        self.prefix = np.full((NUM_CONTEXTS, DICT_INDEXES), ord(" "), np.int32)
        self.letter = np.tile(np.arange(DICT_INDEXES, dtype=np.int32), (NUM_CONTEXTS, 1))
        self.letter[:, 0] = ord("x")
        self.nwi = np.zeros(NUM_CONTEXTS, np.int32)

    def first_byte(self, context: int, index: int) -> int:
        """Walk the prefix chain to the first (literal) byte."""
        steps = 0
        while index & 0x80:
            index = int(self.prefix[context, index - 0x80])
            steps += 1
            if steps > MAX_WORD:
                raise ValueError("circular dictionary chain")
        return index

    def decode_word(self, context: int, index: int) -> bytes:
        rev = []
        steps = 0
        while index & 0x80:
            rev.append(int(self.letter[context, index - 0x80]))
            index = int(self.prefix[context, index - 0x80])
            steps += 1
            if steps > MAX_WORD:
                raise ValueError("circular dictionary chain")
        if index != 0x00:  # 0x00-terminated chain special case (:303-308)
            rev.append(index)
        return bytes(reversed(rev))

    def update(self, prev_context: int, prev_index: int, context: int, index: int):
        """Lock-step LZW insert (update_dictionary, :389-440, fixed)."""
        tochange = int(self.nwi[prev_context])
        special = (index == 0x80 + tochange) and (context == prev_context)
        if special:
            # LZW cScSc case: last letter = first byte of previous word.
            fb = self.first_byte(prev_context, prev_index)
        else:
            fb = self.first_byte(context, index)
        self.prefix[prev_context, tochange] = prev_index
        self.letter[prev_context, tochange] = fb
        self.nwi[prev_context] = (tochange + 1) % DICT_INDEXES

    def find_child(self, context: int, index: int, byte: int, banned: int) -> int:
        """Lowest live slot w with (prefix==index, letter==byte), or -1.

        ``banned`` is the slot the decoder will redefine before decoding
        the next emitted index — its old content must not be referenced.
        """
        hits = np.flatnonzero(
            (self.prefix[context] == index) & (self.letter[context] == byte)
        )
        for w in hits:
            if int(w) != banned:
                return int(w)
        return -1


def small_byte_encode_host(src: bytes) -> bytes:
    """Greedy longest-match encoder (the real version of the stubbed
    compress_byte_index, small_compression.c:507-565)."""
    out = bytearray([EIGHT_BIT_PRUNED])
    if not src:
        return bytes(out)
    if max(src) >= 0x80:
        raise ValueError("small_byte codec requires 7-bit plaintext")
    out.append(src[0])
    d = _ByteDict()
    prev_context = _ctx(ord(" "))  # fix 3
    prev_index = src[0]
    pos = 1
    n = len(src)
    while pos < n:
        context = _ctx(src[pos - 1])
        banned = int(d.nwi[prev_context]) if context == prev_context else -1
        index = src[pos]
        length = 1
        while pos + length < n and length < MAX_WORD - 1:
            w = d.find_child(context, index, src[pos + length], banned)
            if w < 0:
                break
            index = 0x80 + w
            length += 1
        out.append(index)
        d.update(prev_context, prev_index, context, index)
        pos += length
        prev_context, prev_index = context, index
    return bytes(out)


def small_byte_decode_host(payload: bytes, raw_len: int) -> bytes:
    """Lock-step decoder (decompress_bytestring, :453-505, fixed)."""
    if raw_len == 0:
        return b""
    if not payload or payload[0] != EIGHT_BIT_PRUNED:
        raise ValueError("bad small_byte stream type byte")
    out = bytearray([payload[1]])
    d = _ByteDict()
    prev_context = _ctx(ord(" "))
    prev_index = payload[1]
    i = 2
    while len(out) < raw_len:
        if i >= len(payload):
            raise ValueError("truncated small_byte stream")
        index = payload[i]
        i += 1
        context = _ctx(out[-1])
        d.update(prev_context, prev_index, context, index)
        word = d.decode_word(context, index)
        out.extend(word)
        prev_context, prev_index = context, index
    if len(out) != raw_len:
        raise ValueError("small_byte stream decoded past expected length")
    return bytes(out)


# ----------------------------------------------------------------------
# Scheme B: nybble-oriented context LZW
# ----------------------------------------------------------------------

WORD_INDEXES = 256


def _is_literal_index(x: int) -> bool:
    return (x | 0xF) == 0x1F  # small_compression.c:805


class _NybbleTable:
    def __init__(self):
        # initialize_table (:783-836): byte index i decodes to its own
        # two nybbles, low nybble first (little_endian).
        idx = np.arange(WORD_INDEXES, dtype=np.int32)
        self.prefix = (idx & 0x0F) | 0x10  # literal index of first (low) nybble
        self.prefix = np.tile(self.prefix, (NUM_CONTEXTS, 1))
        self.letter = np.tile((idx >> 4) & 0x0F, (NUM_CONTEXTS, 1))
        self.nwi = np.full(NUM_CONTEXTS, 0x80, np.int32)

    def first_nybble(self, context: int, index: int) -> int:
        steps = 0
        while not _is_literal_index(index):
            index = int(self.prefix[context, index])
            steps += 1
            if steps > 2 * MAX_WORD:
                raise ValueError("circular table chain")
        return index & 0xF

    def decode_nybbles(self, context: int, index: int) -> List[int]:
        rev = []
        steps = 0
        while not _is_literal_index(index):
            rev.append(int(self.letter[context, index]))
            index = int(self.prefix[context, index])
            steps += 1
            if steps > 2 * MAX_WORD:
                raise ValueError("circular table chain")
        rev.append(index & 0xF)
        return rev[::-1]

    def update(self, prev_context: int, prev_index: int, context: int, index: int):
        tochange = int(self.nwi[prev_context])
        special = index == tochange and context == prev_context
        if special:
            fn = self.first_nybble(prev_context, prev_index)
        else:
            fn = self.first_nybble(context, index)
        self.prefix[prev_context, tochange] = prev_index
        self.letter[prev_context, tochange] = fn
        nxt = tochange + 1
        if nxt >= 0x100:  # wraptype only_hi_bit_set (:1343-1348)
            nxt = 0x80
        self.nwi[prev_context] = nxt

    def find_child(self, context: int, index: int, nyb: int, banned: int) -> int:
        hits = np.flatnonzero(
            (self.prefix[context] == index) & (self.letter[context] == nyb)
        )
        for w in hits:
            wi = int(w)
            if not _is_literal_index(wi) and wi != banned:
                return wi
        return -1


def _byte_nybbles(data: bytes) -> List[int]:
    """Low nybble first (little_endian, small_compression.c:795-801)."""
    out = []
    for b in data:
        out.append(b & 0xF)
        out.append((b >> 4) & 0xF)
    return out


def small_nybble_encode_host(src: bytes) -> bytes:
    out = bytearray([EIGHT_BIT_PRUNED])
    if not src:
        return bytes(out)
    out.append(src[0])
    t = _NybbleTable()
    nybs = _byte_nybbles(src[1:])
    N = len(nybs)
    prev_context = _ctx(ord(" "))
    prev_index = src[0]
    pos = 0
    out_nybbles = 0  # nybbles emitted so far (tracks context byte)
    while pos < N:
        # context = last complete output byte (decompress :1450).
        # Output equals input, so that byte is src[out_nybbles // 2]
        # (src[0] until the first packed byte completes).
        context = _ctx(src[out_nybbles // 2])
        banned = int(t.nwi[prev_context]) if context == prev_context else -1
        index = nybs[pos] | 0x10
        length = 1
        while pos + length < N and length < 2 * MAX_WORD - 1:
            w = t.find_child(context, index, nybs[pos + length], banned)
            if w < 0:
                break
            index = w
            length += 1
        out.append(index)
        t.update(prev_context, prev_index, context, index)
        pos += length
        out_nybbles += length
        prev_context, prev_index = context, index
    return bytes(out)


def small_nybble_decode_host(payload: bytes, raw_len: int) -> bytes:
    if raw_len == 0:
        return b""
    if not payload or payload[0] != EIGHT_BIT_PRUNED:
        raise ValueError("bad small_nybble stream type byte")
    first = payload[1]
    t = _NybbleTable()
    nybs: List[int] = []
    prev_context = _ctx(ord(" "))
    prev_index = first
    i = 2
    target_nybbles = 2 * (raw_len - 1)
    while len(nybs) < target_nybbles:
        if i >= len(payload):
            raise ValueError("truncated small_nybble stream")
        index = payload[i]
        i += 1
        if len(nybs) < 2:
            context = _ctx(first)
        else:
            done = len(nybs) - (len(nybs) % 2)
            last_byte = nybs[done - 2] | (nybs[done - 1] << 4)
            context = _ctx(last_byte)
        t.update(prev_context, prev_index, context, index)
        nybs.extend(t.decode_nybbles(context, index))
        prev_context, prev_index = context, index
    if len(nybs) != target_nybbles:
        raise ValueError("small_nybble stream decoded past expected length")
    out = bytearray([first])
    for k in range(0, len(nybs), 2):
        out.append(nybs[k] | (nybs[k + 1] << 4))
    return bytes(out)


# ----------------------------------------------------------------------
# Codec wrappers
# ----------------------------------------------------------------------


class SmallByteCodec(Codec):
    name = "small_byte"

    def encode_blocks(self, blocks: np.ndarray, lengths: np.ndarray) -> EncodeResult:
        from data_compression_tpu import native

        use_native = native.load() is not None
        payloads = []
        for i in range(blocks.shape[0]):
            raw = blocks[i, : int(lengths[i])]
            if raw.size and raw.max(initial=0) >= 0x80:
                payloads.append(raw.tobytes())
            elif use_native:
                payloads.append(native.small_byte_encode(raw.tobytes()))
            else:
                payloads.append(small_byte_encode_host(raw.tobytes()))
        return EncodeResult(payloads=payloads)

    def decode_blocks(self, payloads, raw_lens, shared_table=None):
        from data_compression_tpu import native

        if native.load() is not None:
            return [
                native.small_byte_decode(p, r) for p, r in zip(payloads, raw_lens)
            ]
        return [small_byte_decode_host(p, r) for p, r in zip(payloads, raw_lens)]


class SmallNybbleCodec(Codec):
    name = "small_nybble"

    def encode_blocks(self, blocks: np.ndarray, lengths: np.ndarray) -> EncodeResult:
        payloads = []
        for i in range(blocks.shape[0]):
            raw = blocks[i, : int(lengths[i])]
            payloads.append(small_nybble_encode_host(raw.tobytes()))
        return EncodeResult(payloads=payloads)

    def decode_blocks(self, payloads, raw_lens, shared_table=None):
        return [small_nybble_decode_host(p, r) for p, r in zip(payloads, raw_lens)]
