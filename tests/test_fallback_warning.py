"""The pallas fast paths must never fall back silently: a user
benchmarking an unsupported config (arity 3 decode, odd block sizes)
gets the XLA path, and the log must say so (VERDICT round-1, weak #3).
"""

import logging

import numpy as np

from data_compression_tpu import compress, decompress
from data_compression_tpu.config import CodecConfig
from data_compression_tpu.models import huffman as hmod
from tests.conftest import ascii_text


def test_decode_fallback_warns_for_bad_geometry(caplog, rng):
    """Arity 3 decode is fused since round 4, so it must NOT warn about
    arity — but a geometry violation (chunk_syms != block_size/128)
    still must."""
    hmod._fallback_warned.clear()
    data = ascii_text(rng, 8192)
    cfg = CodecConfig(codec="huffman", arity=3, block_size=8192,
                      chunk_syms=512, use_pallas=True, use_device=True)
    stream = compress(data, cfg)
    with caplog.at_level(logging.WARNING, logger="data_compression_tpu"):
        assert decompress(stream, cfg) == data
    msgs = [r.message for r in caplog.records]
    assert any("chunk_syms 512" in m and "decode" in m for m in msgs), msgs
    assert not any("arity 3" in m for m in msgs), msgs


def test_encode_fallback_warns_for_bad_geometry(caplog, rng):
    """block_size 8192 with chunk_syms 512 violates the one-block =
    128 lane-chunks geometry (8192/128 = 64 != 512); must warn."""
    hmod._fallback_warned.clear()
    data = ascii_text(rng, 8192)
    cfg = CodecConfig(codec="huffman", arity=2, block_size=8192,
                      chunk_syms=512, use_pallas=True, use_device=True)
    with caplog.at_level(logging.WARNING, logger="data_compression_tpu"):
        compress(data, cfg)
    msgs = [r.message for r in caplog.records]
    assert any("chunk_syms 512" in m and "encode" in m for m in msgs), msgs


def test_backend_only_mismatch_is_quiet(caplog, rng):
    """On a non-TPU backend with otherwise-supported shapes the
    fallback is expected; it logs at INFO, not WARNING."""
    hmod._fallback_warned.clear()
    data = ascii_text(rng, 65536)
    cfg = CodecConfig(codec="huffman", arity=2, block_size=65536,
                      chunk_syms=512, use_pallas=True, use_device=True)
    with caplog.at_level(logging.INFO, logger="data_compression_tpu"):
        assert decompress(compress(data, cfg), cfg) == data
    warn = [r for r in caplog.records if r.levelno >= logging.WARNING]
    assert not warn, [r.message for r in warn]
    info = [r for r in caplog.records if r.levelno == logging.INFO]
    assert any("backend is not tpu" in r.message for r in info)
