"""Codec interface.

A codec consumes/produces *blocks* — the independent unit of
parallelism (SURVEY.md §5 long-context: block decomposition is the
sharding axis).  Host boundary types are numpy/bytes; device execution
is an implementation detail of each codec (the JAX paths live in
``data_compression_tpu.ops``).
"""

from __future__ import annotations

import abc
import dataclasses
from typing import List, Optional

import numpy as np

from data_compression_tpu.config import CodecConfig


@dataclasses.dataclass
class EncodeResult:
    """Per-block payloads plus an optional stream-level shared table."""

    payloads: List[bytes]
    shared_table: Optional[bytes] = None


class Codec(abc.ABC):
    """Block codec. Implementations must be deterministic: the same
    input blocks yield byte-identical payloads on every backend."""

    name: str = "base"

    def __init__(self, config: CodecConfig):
        self.config = config

    @abc.abstractmethod
    def encode_blocks(self, blocks: np.ndarray, lengths: np.ndarray) -> EncodeResult:
        """Encode [num_blocks, block_size] uint8 rows (valid prefix per
        ``lengths``) into per-block payloads."""

    @abc.abstractmethod
    def decode_blocks(
        self,
        payloads: List[bytes],
        raw_lens: List[int],
        shared_table: Optional[bytes] = None,
    ) -> List[bytes]:
        """Decode payloads back to raw block bytes."""
