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


def test_printable_streamed_multiframe(rng):
    # streamed printable: one armored container per frame; read_frame
    # auto-detects and decompress_stream consumes the concatenation
    import io

    from data_compression_tpu import api
    from data_compression_tpu.config import CodecConfig

    data = bytes(rng.integers(32, 127, size=5 * 2048, dtype=np.uint8))
    cfg = CodecConfig(codec="huffman", arity=2, block_size=1024, chunk_syms=512)
    buf = io.BytesIO()
    st = api.compress_stream(
        io.BytesIO(data), buf, cfg, batch_blocks=2, printable=True
    )
    assert st["frames"] > 1
    blob = buf.getvalue()
    assert all(0x20 <= b <= 0x7E or b == 0x0A for b in blob)  # isprint + \n
    out = io.BytesIO()
    st2 = api.decompress_stream(io.BytesIO(blob), out, CodecConfig())
    assert out.getvalue() == data and st2["frames"] == st["frames"]


def test_printable_mixed_binary_stream(rng):
    # binary and printable frames may interleave in one stream
    import io

    from data_compression_tpu import api
    from data_compression_tpu.config import CodecConfig

    cfg = CodecConfig(codec="huffman", arity=2, block_size=1024, chunk_syms=512)
    a = bytes(rng.integers(32, 127, size=3000, dtype=np.uint8))
    b = bytes(rng.integers(32, 127, size=2000, dtype=np.uint8))
    blob = api.compress(a, cfg, printable=True) + api.compress(b, cfg)
    out = io.BytesIO()
    api.decompress_stream(io.BytesIO(blob), out, CodecConfig())
    assert out.getvalue() == a + b


def test_stats_cli_flag(rng, tmp_path, capsys):
    # --stats prints per-context hit rates for the serial codecs
    # (times_used_directly, nybble_compression.c:543)
    from data_compression_tpu.cli import main

    src = tmp_path / "in.txt"
    src.write_bytes(b"the theme then thews and the masses " * 100)
    for codec in ("nybble", "small_byte", "small_nybble"):
        rc = main([
            "compress", "-c", codec, "--stats", "--no-device",
            "--block-size", "1024", str(src), str(tmp_path / "out.dctz"),
        ])
        assert rc == 0
        err = capsys.readouterr().err
        assert "stats:" in err and "predicted" in err


def test_stats_api_small_codecs(rng):
    from data_compression_tpu.utils.debug import CodecStats
    from data_compression_tpu.config import CodecConfig

    data = b"banana banana banana bandana " * 200
    for codec in ("small_byte", "small_nybble"):
        st = CodecStats(32)
        blob = api.compress(
            data, CodecConfig(codec=codec, block_size=2048, chunk_syms=1024),
            stats=st,
        )
        assert st.hits > 0
        assert api.decompress(blob) == data  # stats path is bit-identical
    with pytest.raises(ValueError):
        api.compress(data, CodecConfig(codec="huffman"), stats=CodecStats())
