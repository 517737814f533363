"""Bit-exact differential parity vs the C reference binary.

BASELINE.json: "Decompressed output must match the C reference
bit-for-bit at <= its compressed size."  The harness compiles
/root/reference/nybble_compression.c unmodified (main renamed) and we
diff whole compressed streams and decompressions byte-for-byte.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from data_compression_tpu.models.nybble import decode_host, encode_host
from tests.conftest import ascii_text

HARNESS_SRC = os.path.join(os.path.dirname(__file__), "oracle", "nybble_harness.c")
REF = "/root/reference/nybble_compression.c"


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if not os.path.exists(REF):
        pytest.skip("reference not mounted")
    exe = tmp_path_factory.mktemp("oracle") / "nybble_harness"
    r = subprocess.run(
        ["gcc", "-std=c17", "-O1", "-o", str(exe), HARNESS_SRC],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[:500]}")
    return str(exe)


def _run(harness, mode: str, data: bytes) -> bytes:
    with tempfile.TemporaryDirectory() as d:
        fin = os.path.join(d, "in")
        fout = os.path.join(d, "out")
        with open(fin, "wb") as f:
            f.write(data)
        r = subprocess.run(
            [harness, mode, fin, fout],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=120,
        )
        assert r.returncode == 0, f"harness {mode} failed"
        with open(fout, "rb") as f:
            return f.read()


def _ref_equivalent_compress(src: bytes) -> bytes:
    """What the reference's nybble_compress emits, built from OUR core:
    the 0xAF stream, or ' '+src when the fallback triggers
    (nybble_compression.c:1018-1037)."""
    stream = encode_host(src)
    if len(stream) >= len(src):
        return b" " + src
    return stream


CANNED = (
    b"Hello, world. "
    b"This is a test. "
    b"This is only a test. "
    b"Banana banana banana banana. "
)


def test_compress_parity_canned(harness):
    assert _run(harness, "c", CANNED) == _ref_equivalent_compress(CANNED)


def test_decompress_parity_canned(harness):
    stream = _run(harness, "c", CANNED)
    ours = encode_host(CANNED)
    assert stream == ours  # this text compresses, no fallback
    # their decoder on our stream:
    assert _run(harness, "d", ours) == CANNED
    # our decoder on their stream:
    assert decode_host(stream, len(CANNED)) == CANNED


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("size", [100, 1000, 20000])
def test_compress_parity_random_ascii(harness, seed, size):
    rng = np.random.default_rng(seed)
    data = ascii_text(rng, size)
    theirs = _run(harness, "c", data)
    ours = _ref_equivalent_compress(data)
    assert theirs == ours, (
        f"first diff at {next(i for i,(a,b) in enumerate(zip(theirs,ours)) if a!=b)}"
    )


def test_compress_parity_printable_binaryish(harness):
    # all 7-bit values except NUL (the reference is a C-string codec)
    rng = np.random.default_rng(9)
    data = bytes(rng.integers(1, 128, size=5000, dtype=np.uint8))
    theirs = _run(harness, "c", data)
    ours = _ref_equivalent_compress(data)
    assert theirs == ours


def test_cross_decode_random(harness):
    rng = np.random.default_rng(11)
    data = ascii_text(rng, 4000)
    ours = encode_host(data)
    if len(ours) < len(data):
        assert _run(harness, "d", ours) == data
        assert decode_host(ours, len(data)) == data
