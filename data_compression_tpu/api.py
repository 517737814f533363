"""High-level compress/decompress API.

The reference's only API is ``main()`` reading stdin in 65,000-byte
blocks (n_ary_huffman.c:2508-2580).  This module is the equivalent
driver: split → encode blocks (device-parallel inside the codec) →
apply the universal LITERAL fallback → frame; and the inverse with
per-block CRC verification.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from data_compression_tpu import framing
from data_compression_tpu.config import CodecConfig
from data_compression_tpu.registry import get_codec
from data_compression_tpu.utils.crc import crc32

BytesLike = Union[bytes, bytearray, memoryview, np.ndarray]


def _as_bytes(data: BytesLike) -> bytes:
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data, dtype=np.uint8).tobytes()
    return bytes(data)


def compress(data: BytesLike, config: Optional[CodecConfig] = None) -> bytes:
    """Compress a byte stream into a framed container."""
    config = config or CodecConfig()
    raw = _as_bytes(data)
    blocks, lengths = framing.split_blocks(raw, config.block_size)
    codec = get_codec(config)
    result = codec.encode_blocks(blocks, lengths)

    payloads, flags, crcs = [], [], []
    for i, payload in enumerate(result.payloads):
        raw_len = int(lengths[i])
        raw_block = blocks[i, :raw_len].tobytes()
        crcs.append(crc32(raw_block))
        # Universal LITERAL fallback: store raw when compression loses
        # (reference rule, e.g. nybble_compression.c:1018-1037).
        if len(payload) >= raw_len and config.codec != "literal":
            payloads.append(raw_block)
            flags.append(framing.BLOCK_LITERAL)
        else:
            payloads.append(payload)
            flags.append(0)

    chunk_log2 = (
        config.chunk_syms.bit_length() - 1 if config.codec == "huffman" else 0
    )
    return framing.pack_frame(
        codec_id=config.codec_id,
        arity=config.arity,
        block_size=config.block_size,
        total_len=len(raw),
        payloads=payloads,
        raw_lens=[int(x) for x in lengths],
        crcs=crcs,
        block_flags=flags,
        shared_table=result.shared_table,
        chunk_log2=chunk_log2,
    )


def decompress(data: BytesLike, config: Optional[CodecConfig] = None) -> bytes:
    """Decompress a framed container. ``config`` may override runtime
    execution knobs (use_device); format parameters come from the frame."""
    frame = framing.unpack_frame(_as_bytes(data))
    chunk_syms = frame.chunk_syms or min(4096, frame.block_size)
    cfg = CodecConfig(
        codec=frame.codec_name,
        arity=frame.arity if frame.codec_name == "huffman" else 2,
        block_size=frame.block_size,
        chunk_syms=chunk_syms,
        shared_table=frame.shared_table is not None,
        use_device=(config.use_device if config else True),
    )
    codec = get_codec(cfg)

    coded_idx = [i for i, e in enumerate(frame.entries) if not e.is_literal]
    out: list = [None] * len(frame.entries)
    for i, e in enumerate(frame.entries):
        if e.is_literal:
            out[i] = frame.payloads[i]
    if coded_idx:
        decoded = codec.decode_blocks(
            [frame.payloads[i] for i in coded_idx],
            [frame.entries[i].raw_len for i in coded_idx],
            shared_table=frame.shared_table,
        )
        for i, blk in zip(coded_idx, decoded):
            out[i] = blk

    for i, e in enumerate(frame.entries):
        if len(out[i]) != e.raw_len:
            raise ValueError(f"block {i}: decoded length {len(out[i])} != {e.raw_len}")
        if crc32(out[i]) != e.crc:
            raise ValueError(f"block {i}: CRC mismatch (corrupt stream?)")
    result = b"".join(out)
    if len(result) != frame.total_len:
        raise ValueError("total length mismatch")
    return result


def roundtrip(data: BytesLike, config: Optional[CodecConfig] = None) -> bool:
    """The universal oracle of the reference's tests: compress →
    decompress → memcmp (e.g. nybble_compression.c:1166-1173)."""
    return decompress(compress(data, config), config) == _as_bytes(data)


def compress_file(src: str, dst: str, config: Optional[CodecConfig] = None) -> dict:
    with open(src, "rb") as f:
        data = f.read()
    out = compress(data, config)
    with open(dst, "wb") as f:
        f.write(out)
    return {
        "raw_bytes": len(data),
        "compressed_bytes": len(out),
        "ratio": len(out) / max(1, len(data)),
    }


def decompress_file(src: str, dst: str, config: Optional[CodecConfig] = None) -> dict:
    with open(src, "rb") as f:
        data = f.read()
    out = decompress(data, config)
    with open(dst, "wb") as f:
        f.write(out)
    return {"compressed_bytes": len(data), "raw_bytes": len(out)}
