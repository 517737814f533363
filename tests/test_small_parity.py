"""Differential parity vs the compiled small_compression reference.

Mirrors tests/test_nybble_parity.py: tests/oracle/small_harness.c
compiles /root/reference/small_compression.c unmodified (main renamed)
and exposes its WORKING entry points — the scheme-A/B decoders and the
mock encoders its own 4/4-passing main() exercises
(small_compression.c:1771-1876).  The real scheme-A encoder is stubbed
in the reference (:530-549) and the real scheme-B encoder never wins
(LITERAL fallback fires even on b"a"*300 — asserted below), so the
parity domain is: mock-encoder streams, plus OUR encoders' streams on
inputs small enough that the reference's mutating-chain dictionary
semantics coincide with our frozen-span semantics.

The divergence boundaries are pinned down explicitly:

  * scheme A: the reference decoder hits its unimplemented LZW
    special case (``assert(0)``, update_dictionary :428) on streams a
    few hundred bytes in; our frozen-span decoder needs no special
    case (models/small.py docstring) and keeps going.
  * scheme A: before that crash, mutating chains re-read overwritten
    slots, so the decoders diverge once a referenced slot's chain has
    been rewritten — demonstrated at a fixed seed below.
  * scheme B: same story plus a segfault (runaway recursion in
    decompress_index :1220-1265) on larger streams.

All corpora are printable ASCII: the reference's decode path asserts
``isprint`` on dictionary prefixes (debug_print_dictionary_entry :354),
so non-printable input crashes it before any codec logic runs.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from data_compression_tpu.models.small import (
    small_byte_decode_host,
    small_byte_encode_host,
    small_nybble_decode_host,
    small_nybble_encode_host,
)

HARNESS_SRC = os.path.join(os.path.dirname(__file__), "oracle", "small_harness.c")
REF = "/root/reference/small_compression.c"

CANNED = (
    b"Hello, world. "
    b"This is a test. "
    b"This is only a test. "
    b"Banana banana banana banana. "
)


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if not os.path.exists(REF):
        pytest.skip("reference not mounted")
    exe = tmp_path_factory.mktemp("oracle") / "small_harness"
    r = subprocess.run(
        ["gcc", "-std=c17", "-O1", "-o", str(exe), HARNESS_SRC],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[:500]}")
    return str(exe)


def _run(harness, mode: str, data: bytes):
    """Returns output bytes, or the process returncode on crash."""
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
        if r.returncode != 0:
            return r.returncode
        with open(fout, "rb") as f:
            return f.read()


def printable_text(rng, size):
    letters = np.frombuffer(b" eetaoinshrdlcumwfgypbvk.,", dtype=np.uint8)
    return rng.choice(letters, size=size).tobytes()


# ------------------------- scheme A (byte LZW) -------------------------


def test_scheme_a_mock_parity_canned(harness):
    stream = _run(harness, "mb", CANNED)
    assert isinstance(stream, bytes) and stream[0] == 8
    ref_dec = _run(harness, "db", stream)
    assert ref_dec == CANNED
    assert small_byte_decode_host(stream, len(ref_dec)) == ref_dec


@pytest.mark.parametrize("size", [40, 80, 200, 500, 1000])
def test_scheme_a_mock_parity_random(harness, size):
    """Reference mock encoder -> both decoders agree byte-for-byte."""
    rng = np.random.default_rng(size)
    text = printable_text(rng, size)
    stream = _run(harness, "mb", text)
    assert isinstance(stream, bytes)
    if stream[:1] == b" ":  # LITERAL fallback: nothing to diff
        return
    ref_dec = _run(harness, "db", stream)
    assert isinstance(ref_dec, bytes), "reference decoder crashed in-domain"
    ours = small_byte_decode_host(stream, len(ref_dec))
    assert ours == ref_dec


@pytest.mark.parametrize("size", [40, 100])
def test_scheme_a_our_encoder_ref_decodes(harness, size):
    """Our real encoder's streams decode correctly in the reference
    binary while the dictionaries are still congruent (small inputs)."""
    rng = np.random.default_rng(1000 + size)
    text = printable_text(rng, size)
    ours = small_byte_encode_host(text)
    assert _run(harness, "db", ours) == text


def test_scheme_a_frozen_span_divergence_boundary(harness):
    """The documented divergence: on a 400-byte corpus the reference's
    mutating-chain decoder re-reads slots our frozen spans captured at
    insert time — the outputs differ while OUR pair stays bit-exact."""
    rng = np.random.default_rng(1400)
    text = printable_text(rng, 400)
    ours = small_byte_encode_host(text)
    assert small_byte_decode_host(ours, len(text)) == text  # our pair: exact
    ref_dec = _run(harness, "db", ours)
    assert isinstance(ref_dec, bytes)
    assert ref_dec != text, "expected mutating-chain divergence"
    # divergence is a strict suffix property: prefixes agree
    first = next(i for i, (a, b) in enumerate(zip(ref_dec, text)) if a != b)
    assert first > 0


def test_scheme_a_ref_lzw_special_case_crash(harness):
    """Larger streams hit the reference's assert(0) LZW special case
    (small_compression.c:428); our decoder handles it by construction."""
    rng = np.random.default_rng(1800)
    text = printable_text(rng, 800)
    ours = small_byte_encode_host(text)
    assert small_byte_decode_host(ours, len(text)) == text
    rc = _run(harness, "db", ours)
    assert isinstance(rc, int) and rc != 0, "expected reference assert(0)"


# ------------------------ scheme B (nybble LZW) ------------------------


def test_scheme_b_real_encoder_always_falls_back(harness):
    """The reference's real greedy encoder (compress :1588) never beats
    LITERAL — even on b'a'*300 — so no reference-encoded compressed
    scheme-B stream exists to diff against."""
    for text in (b"a" * 300, b"banana banana banana " * 20, CANNED):
        stream = _run(harness, "cn", text)
        assert isinstance(stream, bytes)
        assert stream[:1] == b" ", "reference scheme-B encoder unexpectedly won"
        assert stream[1:] == text


@pytest.mark.parametrize("size", [40, 80])
def test_scheme_b_our_encoder_ref_decodes(harness, size):
    rng = np.random.default_rng(42 + size)
    text = printable_text(rng, size)
    ours = small_nybble_encode_host(text)
    if 0 in ours:  # reference APIs are NUL-terminated C strings
        pytest.skip("stream contains NUL; reference cannot carry it")
    assert _run(harness, "dn", ours) == text


def test_scheme_b_divergence_and_ref_crash(harness):
    """Boundary: at 150 bytes the decoders diverge (mutating chains);
    by 300 bytes the reference segfaults in its recursive
    decompress_index (:1220) while our pair stays exact."""
    rng = np.random.default_rng(42 + 150)
    text = printable_text(rng, 150)
    ours = small_nybble_encode_host(text)
    assert small_nybble_decode_host(ours, len(text)) == text
    if 0 not in ours:
        ref_dec = _run(harness, "dn", ours)
        assert ref_dec != text  # documented divergence

    rng = np.random.default_rng(42 + 300)
    text = printable_text(rng, 300)
    ours = small_nybble_encode_host(text)
    assert small_nybble_decode_host(ours, len(text)) == text
    if 0 not in ours:
        rc = _run(harness, "dn", ours)
        assert isinstance(rc, int) and rc != 0, "expected reference crash"
