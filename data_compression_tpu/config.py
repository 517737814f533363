"""Codec configuration.

The reference hard-codes every knob at compile time
(``compressed_symbols`` = 3 at n_ary_huffman.c:2529, ``#define
num_contexts``/``letters_per_context`` at nybble_compression.c:515-516,
block size 65,000 at n_ary_huffman.c:2513).  Here they are a runtime
dataclass so one build serves every configuration.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# Stable on-the-wire codec ids (framing.py writes these into the header).
CODEC_IDS = {
    "literal": 0,
    "nybble": 1,
    "small_byte": 2,
    "small_nybble": 3,
    "huffman": 4,
}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}

# Default block size. The reference streams stdin in 65,000-byte blocks
# (n_ary_huffman.c:2513); we use 64 KiB so blocks tile exactly into
# power-of-two chunks on device.
DEFAULT_BLOCK_SIZE = 64 * 1024

# Default chunk: the unit of intra-block parallelism for Huffman
# encode/decode. Each chunk's payload starts byte-aligned. 512 makes a
# 64 KiB block exactly 128 chunks — one VPU lane each in the Pallas
# encode kernel (ops/pallas/encode_kernel.py).
DEFAULT_CHUNK_SYMS = 512

# Huffman code lengths must stay below 16 digits; the reference asserts
# the same bound (n_ary_huffman.c:1414).
MAX_CODE_LEN = 15

# Per-arity length caps chosen so code values and scaled decode windows
# fit in int32 on device (TPU int64 is off by default): n^cap < 2^31.
# 16^7 = 2^28; 3^15 ~= 14.3M; 2^15 = 32768.
ARITY_MAX_LEN = {2: 15, 3: 15, 16: 7}

# Digits packed per output byte: n=2 -> 8 bits, n=3 -> 5 trits
# (3^5 = 243 <= 255, the reference's trit-packing note at
# n_ary_huffman.c:745-753), n=16 -> 2 nybbles.
ARITY_DIGITS_PER_BYTE = {2: 8, 3: 5, 16: 2}


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Runtime configuration for a codec instance.

    Attributes:
      codec: codec family name (key of CODEC_IDS).
      arity: n for n-ary Huffman (2, 3, or 16). Ignored by other codecs.
      block_size: uncompressed bytes per independent block (sharding unit).
      chunk_syms: symbols per intra-block chunk (Huffman parallel unit).
      shared_table: if True, one Huffman table for the whole stream
        (histogram psum-reduced across devices); if False, a table per
        block.
      use_device: if True, run the vectorized JAX path; if False use the
        host (numpy) reference path.
    """

    codec: str = "huffman"
    arity: int = 2
    block_size: int = DEFAULT_BLOCK_SIZE
    chunk_syms: int = DEFAULT_CHUNK_SYMS
    use_pallas: bool = True  # fused TPU kernels when shapes/backend allow
    shared_table: bool = False
    use_device: bool = True
    level: Optional[int] = None  # reserved

    def __post_init__(self):
        if self.codec not in CODEC_IDS:
            raise ValueError(f"unknown codec {self.codec!r}")
        if self.codec == "huffman" and self.arity not in (2, 3, 16):
            raise ValueError(f"huffman arity must be 2, 3 or 16, got {self.arity}")
        if self.block_size <= 0 or self.block_size > 2**31:
            raise ValueError(f"bad block_size {self.block_size}")
        if self.chunk_syms <= 0 or self.block_size % self.chunk_syms:
            raise ValueError(
                f"chunk_syms {self.chunk_syms} must divide block_size {self.block_size}"
            )
        if self.codec == "huffman" and self.chunk_syms & (self.chunk_syms - 1):
            raise ValueError("huffman chunk_syms must be a power of two")

    @property
    def codec_id(self) -> int:
        return CODEC_IDS[self.codec]
