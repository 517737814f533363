"""base64url digits, printable armor, debug tooling."""

import base64

import numpy as np
import pytest

from data_compression_tpu import compress, decompress
from data_compression_tpu.config import CodecConfig
from data_compression_tpu.utils.base64url import armor, dearmor, digit2int, int2digit
from data_compression_tpu.utils.debug import (
    CodecStats,
    c_literal,
    c_string,
    dump_nybble_table,
    trace_nybble_decode,
)
from tests.conftest import ascii_text


def test_digit_tables_match_rfc4648():
    # same alphabet as n_ary_huffman.c:371-428 (base64url)
    std = base64.urlsafe_b64encode(bytes(range(48))).decode()
    for i in range(64):
        assert digit2int(int2digit(i)) == i
    assert int2digit(62) == "-" and int2digit(63) == "_"
    # digit2int accepts the standard-alphabet variants (:444-447)
    assert digit2int("+") == 62 and digit2int("/") == 63
    assert "".join(int2digit(i) for i in range(64)) == (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"
    )
    with pytest.raises(ValueError):
        digit2int("!")


@pytest.mark.parametrize("size", [0, 1, 2, 3, 100, 5000])
def test_armor_roundtrip(size, rng):
    data = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
    text = armor(data)
    assert all(0x20 <= ord(c) < 0x7F or c == "\n" for c in text)
    assert dearmor(text) == data


def test_armor_of_compressed_stream(rng):
    data = ascii_text(rng, 4096)
    comp = compress(data, CodecConfig(codec="huffman", block_size=2048, chunk_syms=512, use_device=False))
    text = armor(comp)
    assert decompress(dearmor(text)) == data


def test_c_literal_roundtrip_semantics():
    # the literal must be a valid C string producing the same bytes;
    # check the tricky hex-escape/hex-digit collision (:588-597)
    data = b'\x01a"b\\c\nd\te\xff0'
    lit = c_literal(data)
    # a hex digit following a hex escape must be separated so the C
    # lexer can't merge them
    assert '\\x01" "a' in lit
    assert '\\xff" "0' in lit
    assert c_string(b"hi").startswith("char compressed_data[]")


def test_dump_and_trace(rng):
    from data_compression_tpu.models.nybble import encode_host, _new_table

    assert "ctx 15" in dump_nybble_table(_new_table())
    text = b"Hello, hello, hello."
    payload = encode_host(text)
    steps = list(trace_nybble_decode(payload, len(text)))
    decoded = "".join(s[1] for s in steps)
    assert len(steps) >= len(text)  # header rows + one per byte


def test_codec_stats():
    s = CodecStats()
    s.hit(3)
    s.hit(3)
    s.literal()
    assert "66.7% predicted" in s.summary()
    assert s.times_used_directly[3] == 2


def test_z85_armor_roundtrip(rng):
    from data_compression_tpu.utils.base64url import z85_armor, z85_dearmor

    for size in (0, 1, 4, 7, 1000):
        data = rng.integers(0, 256, size=size, dtype="uint8").tobytes()
        text = z85_armor(data)
        assert all(ln.isascii() and ln.isprintable() for ln in text.splitlines())
        assert z85_dearmor(text) == data


def test_ascii85_armor_roundtrip(rng):
    from data_compression_tpu.utils.base64url import (
        ascii85_armor,
        ascii85_dearmor,
    )

    for size in (0, 1, 4, 7, 1000):
        data = rng.integers(0, 256, size=size, dtype="uint8").tobytes()
        text = ascii85_armor(data)
        assert all(ln.isascii() and ln.isprintable() for ln in text.splitlines())
        assert ascii85_dearmor(text) == data
    # the 'z' shorthand for all-zero groups (btoa/Adobe convention)
    text = ascii85_armor(b"\x00" * 8 + b"ab")
    assert "z" in text.partition("\n")[2]
    assert ascii85_dearmor(text) == b"\x00" * 8 + b"ab"


def test_armor_cli(tmp_path, rng):
    from data_compression_tpu.cli import main

    data = rng.integers(0, 256, size=333, dtype="uint8").tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    for alpha in ("base64url", "z85", "ascii85"):
        a = tmp_path / f"a.{alpha}"
        b = tmp_path / f"b.{alpha}"
        assert main(["armor", "-a", alpha, str(src), str(a)]) == 0
        assert main(["dearmor", str(a), str(b)]) == 0
        assert b.read_bytes() == data


def test_dump_small_dictionary():
    # the reference's dictionary dump (small_compression.c:322-374),
    # rendered from a live decode's span dictionary
    from data_compression_tpu.models.small import (
        _ByteDict,
        small_byte_encode_host,
    )
    from data_compression_tpu.utils.debug import dump_small_dictionary

    data = b"the cat sat on the mat. the cat sat again. " * 5
    payload = small_byte_encode_host(data)
    # replay the decoder to populate a dictionary
    from data_compression_tpu.models.small import small_byte_decode_host

    assert small_byte_decode_host(payload, len(data)) == data
    d = _ByteDict()
    out = bytearray([payload[1]])
    prev = (0, payload[1], 0, 1)
    i = 2
    while len(out) < len(data):
        index = payload[i]
        i += 1
        ctx = out[-1] & 31
        pos = len(out)
        wl = d.emit(ctx, index, out)
        d.add(prev[0], prev[1], prev[2], prev[3], out[pos])
        prev = (ctx, index, pos, wl)
    text = dump_small_dictionary(d, bytes(out))
    assert "ctx" in text and "slot" in text
    assert text.count("\n") > 3  # real entries rendered
