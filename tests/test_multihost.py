"""True multi-process pipeline test: 2 processes x 4 virtual CPU
devices, jax.distributed coordinator on localhost, cooperative
compression via make_array_from_process_local_data, identical frames on
every host, verified round-trip."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
sys.path.insert(0, os.getcwd())
from data_compression_tpu.config import CodecConfig
from data_compression_tpu.parallel.multihost import compress_multihost_bytes
from data_compression_tpu.utils.corpora import synthetic_enwik

data = synthetic_enwik(32 * 1024, seed=3)
cfg = CodecConfig(codec="huffman", arity=2, block_size=4096, chunk_syms=512)
out = compress_multihost_bytes(data, cfg)
import hashlib
print(f"RESULT {pid} {len(out)} {hashlib.sha256(out).hexdigest()}", flush=True)
if pid == 0:
    from data_compression_tpu import decompress
    back = decompress(out, CodecConfig(chunk_syms=512, use_device=False))
    assert back == data, "multihost roundtrip mismatch"
    print("ROUNDTRIP OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_compress(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(port), str(pid)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    # identical stream on both hosts
    res = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, ln, h = line.split()
                res[pid] = (ln, h)
    assert res["0"] == res["1"], f"hosts disagree: {res}"
    assert "ROUNDTRIP OK" in outs[0] or "ROUNDTRIP OK" in outs[1]
