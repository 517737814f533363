"""Codec model families.

The reference's three schemes, plus the universal LITERAL pass-through:

* ``huffman``      — n-ary canonical Huffman (n_ary_huffman.c)
* ``nybble``       — 16-context MTF nybble codec (nybble_compression.c)
* ``small_byte``   — context byte-LZW (small_compression.c scheme A)
* ``small_nybble`` — context nybble-LZW (small_compression.c scheme B)
* ``literal``      — pass-through fallback (all three reference files)
"""

from data_compression_tpu.models.base import Codec, EncodeResult
from data_compression_tpu.models.literal import LiteralCodec
from data_compression_tpu.models.nybble import NybbleCodec
from data_compression_tpu.models.small import SmallByteCodec, SmallNybbleCodec
from data_compression_tpu.models.huffman import HuffmanCodec
