import pytest

from data_compression_tpu import framing
from data_compression_tpu.utils.crc import crc32


def test_header_roundtrip():
    payloads = [b"abc", b"", b"x" * 100]
    raw_lens = [3, 0, 50]
    crcs = [crc32(b"abc"), 0, 123]
    flags = [0, 0, framing.BLOCK_LITERAL]
    data = framing.pack_frame(4, 2, 65536, 53, payloads, raw_lens, crcs, flags)
    f = framing.unpack_frame(data)
    assert f.codec_id == 4 and f.arity == 2
    assert f.block_size == 65536 and f.total_len == 53
    assert f.shared_table is None
    assert [e.comp_len for e in f.entries] == [3, 0, 100]
    assert [e.raw_len for e in f.entries] == raw_lens
    assert f.payloads == payloads
    assert f.entries[2].is_literal


def test_shared_table_section():
    table = bytes(range(256))
    data = framing.pack_frame(4, 3, 1024, 10, [b"p"], [10], [1], [0], shared_table=table)
    f = framing.unpack_frame(data)
    assert f.shared_table == table
    assert f.flags & framing.FLAG_SHARED_TABLE
    assert f.payloads == [b"p"]


def test_corrupt_header_detected():
    data = bytearray(framing.pack_frame(1, 2, 1024, 4, [b"abcd"], [4], [0], [0]))
    data[5] ^= 0xFF
    with pytest.raises(ValueError):
        framing.unpack_frame(bytes(data))


def test_truncated_payload_detected():
    data = framing.pack_frame(1, 2, 1024, 4, [b"abcd"], [4], [0], [0])
    with pytest.raises(ValueError):
        framing.unpack_frame(data[:-2])


def test_split_join_blocks():
    data = bytes(range(256)) * 10  # 2560 bytes
    blocks, lengths = framing.split_blocks(data, 1000)
    assert blocks.shape == (3, 1000)
    assert list(lengths) == [1000, 1000, 560]
    assert framing.join_blocks(blocks, lengths) == data
    # exact multiple
    blocks, lengths = framing.split_blocks(data[:2000], 1000)
    assert blocks.shape == (2, 1000)
    assert framing.join_blocks(blocks, lengths) == data[:2000]
    # empty
    blocks, lengths = framing.split_blocks(b"", 1000)
    assert blocks.shape == (0, 1000)
    assert framing.join_blocks(blocks, lengths) == b""
