import numpy as np

from data_compression_tpu.utils.corpora import (
    load_or_synthesize,
    mixed_corpus,
    synthetic_english,
    synthetic_enwik,
)


def test_generators_deterministic():
    assert synthetic_enwik(1000, 7) == synthetic_enwik(1000, 7)
    assert synthetic_english(1000, 7) == synthetic_english(1000, 7)
    assert synthetic_enwik(1000, 7) != synthetic_enwik(1000, 8)


def test_sizes():
    assert len(load_or_synthesize("enwik6")) == 10**6
    assert len(mixed_corpus(9999)) == 9999
    assert len(synthetic_english(12345)) == 12345


def test_statistics_reasonable():
    data = np.frombuffer(synthetic_enwik(100000), np.uint8)
    counts = np.bincount(data, minlength=256).astype(np.float64)
    p = counts[counts > 0] / counts.sum()
    entropy = -(p * np.log2(p)).sum()
    assert 3.5 < entropy < 5.0  # enwik8-like order-0 entropy

    # english generator must contain real repeated words for LZW
    text = synthetic_english(10000)
    assert text.count(b"the") > 20


def test_compressibility():
    from data_compression_tpu import compress, decompress
    from data_compression_tpu.config import CodecConfig

    data = synthetic_english(16384)
    cfg = CodecConfig(codec="small_byte", block_size=4096, chunk_syms=512, use_device=False)
    out = compress(data, cfg)
    assert decompress(out) == data
    assert len(out) < len(data) // 2  # word-structured text compresses well
