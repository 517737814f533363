"""In-band printable container (the reference's reserved '_' mode,
small_compression.c:35-40): whole stream isprint, per-block Z85 spans,
roundtrip through api and the CLI."""

import numpy as np
import pytest

from data_compression_tpu import api, framing
from data_compression_tpu.config import CodecConfig
from tests.conftest import ascii_text


@pytest.mark.parametrize("codec", ["huffman", "nybble", "literal"])
def test_printable_roundtrip_all_isprint(rng, codec):
    data = ascii_text(rng, 3 * 4096 + 123)
    cfg = CodecConfig(codec=codec, block_size=4096, chunk_syms=512,
                      use_device=False)
    out = api.compress(data, cfg, printable=True)
    text = out.decode("ascii")
    assert all(c.isprintable() or c == "\n" for c in text), "non-isprint byte"
    assert api.decompress(out) == data
    # binary and printable forms are interconvertible
    binary = api.compress(data, cfg)
    assert framing.printable_to_frame(out) == binary
    assert framing.frame_to_printable(binary) == out


def test_printable_shared_table(rng):
    data = ascii_text(rng, 2 * 4096)
    cfg = CodecConfig(codec="huffman", block_size=4096, chunk_syms=512,
                      shared_table=True, use_device=False)
    out = api.compress(data, cfg, printable=True)
    assert api.decompress(out) == data


def test_printable_corruption_detected(rng):
    data = ascii_text(rng, 4096)
    cfg = CodecConfig(codec="huffman", block_size=4096, chunk_syms=512,
                      use_device=False)
    out = bytearray(api.compress(data, cfg, printable=True))
    out[-10] = ord("?") if out[-10] != ord("?") else ord("!")
    with pytest.raises(ValueError):
        api.decompress(bytes(out))


def test_printable_cli_roundtrip(rng, tmp_path):
    from data_compression_tpu.cli import main

    data = ascii_text(rng, 10000)
    src = tmp_path / "in.txt"
    dst = tmp_path / "out.dctp"
    back = tmp_path / "back.txt"
    src.write_bytes(data)
    assert main(["compress", "--printable", "--no-device",
                 "--block-size", "4096", "--chunk-syms", "512",
                 str(src), str(dst)]) == 0
    blob = dst.read_bytes()
    assert blob.startswith(framing.PRINTABLE_MAGIC)
    assert all(32 <= b < 127 or b == 10 for b in blob)
    assert main(["decompress", "--no-device", str(dst), str(back)]) == 0
    assert back.read_bytes() == data


def test_codec_stats_wired(rng):
    from data_compression_tpu.models.nybble import encode_host
    from data_compression_tpu.utils.debug import CodecStats

    stats = CodecStats()
    encode_host(b"the theme then thews " * 20, stats=stats)
    assert stats.hits > 0 and stats.literals > 0
    assert sum(stats.times_used_directly) == stats.hits
    assert "predicted" in stats.summary()
