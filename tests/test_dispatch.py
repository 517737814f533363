"""Default-routing contracts for the serial-state codecs.

Round-3 regression guard: the lax.scan device paths (one scan step per
output byte, ~300 KB/s) must never be the production default — decode
of a nybble/small frame routes to the native C batch path unless the
caller explicitly opts in with ``CodecConfig.use_scan=True``.
"""

import numpy as np
import pytest

from data_compression_tpu import api
from data_compression_tpu.config import CodecConfig


def _frame(codec, nblocks=3, block=4096):
    rng = np.random.default_rng(7)
    letters = np.frombuffer(b" etaoinshrdlcum.,\n", np.uint8)
    data = rng.choice(letters, size=nblocks * block).tobytes()
    cfg = CodecConfig(codec=codec, block_size=block)
    return data, api.compress(data, cfg)


def _boom(*a, **k):
    raise AssertionError("scan path reached on a default config")


@pytest.mark.parametrize("codec", ["nybble", "small_byte"])
def test_default_decode_is_not_scan(codec, monkeypatch):
    import data_compression_tpu.ops.scan_codecs as sc

    data, blob = _frame(codec)
    monkeypatch.setattr(sc, "nybble_decode_blocks", _boom)
    monkeypatch.setattr(sc, "small_byte_decode_blocks", _boom)
    assert api.decompress(blob) == data


def test_default_encode_is_not_scan(monkeypatch):
    import data_compression_tpu.ops.scan_codecs as sc

    monkeypatch.setattr(sc, "nybble_encode_blocks", _boom)
    data, blob = _frame("nybble")
    assert api.decompress(blob) == data


def test_use_scan_opts_in(monkeypatch):
    import data_compression_tpu.ops.scan_codecs as sc

    data, blob = _frame("nybble", nblocks=2, block=2048)
    called = {}
    real = sc.nybble_decode_blocks

    def spy(payloads, raw_lens):
        called["yes"] = True
        return real(payloads, raw_lens)

    monkeypatch.setattr(sc, "nybble_decode_blocks", spy)
    cfg = CodecConfig(codec="nybble", use_scan=True)
    assert api.decompress(blob, cfg) == data
    assert called.get("yes")


def test_batch_matches_host_reference(rng):
    """The OpenMP batch path is byte-identical to the per-block host
    encoders (which are parity-tested against the reference binary)."""
    from data_compression_tpu import native
    from data_compression_tpu.models import nybble, small

    if native.load() is None:
        pytest.skip("native library unavailable")
    letters = np.frombuffer(b" etaoinshrdlcu.,\n", np.uint8)
    B, S = 5, 1536
    blocks = rng.choice(letters, size=(B, S)).astype(np.uint8)
    lengths = np.asarray([S, S, S // 2, 1, S])
    enc = native.encode_batch("nybble", blocks, lengths)
    for i in range(B):
        ref = nybble.encode_host(blocks[i, : int(lengths[i])].tobytes())
        assert enc[i] == ref
    dec = native.decode_batch("nybble", enc, [int(x) for x in lengths])
    for i in range(B):
        assert dec[i] == blocks[i, : int(lengths[i])].tobytes()
    enc = native.encode_batch("small_nybble", blocks, lengths)
    for i in range(B):
        ref = small.small_nybble_encode_host(
            blocks[i, : int(lengths[i])].tobytes()
        )
        assert enc[i] == ref
