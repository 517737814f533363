"""True multi-process pipeline tests: 2 processes x 4 virtual CPU
devices, jax.distributed coordinator on localhost.

Covers both directions of the multihost runtime: cooperative
compression (per-block and shared-table modes — the latter exercises
the in-jit cross-host histogram all-reduce), identical frames on every
host, and cooperative decompression back to the original bytes on BOTH
hosts."""

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
from data_compression_tpu.parallel.multihost import (
    compress_multihost_bytes,
    decompress_multihost_bytes,
)
from data_compression_tpu.utils.corpora import synthetic_enwik

data = synthetic_enwik(32 * 1024, seed=3)
import hashlib
for shared in (False, True):
    cfg = CodecConfig(codec="huffman", arity=2, block_size=4096,
                      chunk_syms=512, shared_table=shared)
    out = compress_multihost_bytes(data, cfg)
    tag = "SHARED" if shared else "PERBLK"
    print(f"RESULT {tag} {pid} {len(out)} "
          f"{hashlib.sha256(out).hexdigest()}", flush=True)
    # cooperative decode on BOTH hosts
    back = decompress_multihost_bytes(out, cfg)
    assert back == data, f"multihost roundtrip mismatch ({tag})"
    print(f"ROUNDTRIP {tag} {pid} OK", flush=True)
    if pid == 0 and not shared:
        # cross-check: single-process decode of the multihost frame
        from data_compression_tpu import decompress
        back1 = decompress(out, CodecConfig(chunk_syms=512, use_device=False))
        assert back1 == data, "single-process decode mismatch"
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(script, nproc=2, timeout=600, extra_args=()):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(nproc):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script, str(port), str(pid), *extra_args],
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
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    return outs


@pytest.mark.slow
def test_two_process_roundtrip():
    outs = _run_workers(_WORKER)
    # identical stream on both hosts, both modes
    res = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, tag, pid, ln, h = line.split()
                res[(tag, pid)] = (ln, h)
    for tag in ("PERBLK", "SHARED"):
        assert res[(tag, "0")] == res[(tag, "1")], f"hosts disagree: {res}"
    # cooperative decode succeeded on every host in both modes
    joined = "\n".join(outs)
    for tag in ("PERBLK", "SHARED"):
        for pid in ("0", "1"):
            assert f"ROUNDTRIP {tag} {pid} OK" in joined
