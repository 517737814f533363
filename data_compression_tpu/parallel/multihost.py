"""Multi-host (multi-process) pipeline.

The reference is a single-threaded filter; nothing distributed exists
there (SURVEY.md §2.5).  This module is the framework's multi-host
runtime per BASELINE.json's north star: shard a stream across hosts
over DCN, build tables with a psum-reduced histogram over ICI+DCN, and
gather compressed blocks in order with exact framing offsets.

Execution model (one process per host, jax.distributed):

  1. ``initialize()`` — jax.distributed.initialize(); afterwards
     jax.devices() spans the slice and process_index() identifies the
     host.
  2. Each host reads/owns ``blocks[process_index::process_count]``
     (strided ownership keeps the final gather ordered without an
     explicit permutation).
  3. ``jax.make_array_from_process_local_data`` assembles the global
     [B, S] array over the mesh; the sharded encode step then runs
     exactly as in pipeline.py — the all-reduce for shared-table mode
     crosses hosts over DCN automatically.
  4. Per-block compressed lengths return replicated; every host
     computes identical exact offsets (prefix sum) and host 0 writes
     the frame: lengths are tiny (16 B/block), payload gather to host 0
     uses jax process allgather of the payload shards.

Single-machine testing: run N processes with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=K``
and jax.distributed's local coordinator — exercised by
tests/test_multihost.py via subprocesses.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper (env-driven when args omitted)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def process_local_block_ids(num_blocks: int) -> np.ndarray:
    """Strided ownership: host p owns blocks p, p+P, p+2P, ..."""
    p = jax.process_index()
    P = jax.process_count()
    return np.arange(p, num_blocks, P)


def compress_multihost(local_data_path: str, out_path: str, config) -> dict:
    """Compress a file cooperatively across all hosts.

    Every host must call this with the same arguments.  Host 0 writes
    ``out_path`` and returns stats; other hosts return {}.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from data_compression_tpu import framing
    from data_compression_tpu.parallel.mesh import make_mesh
    from data_compression_tpu.parallel.pipeline import compress_sharded

    with open(local_data_path, "rb") as f:
        data = f.read()

    mesh = make_mesh()  # global mesh over all hosts' devices
    out = compress_sharded(data, config, mesh)

    if jax.process_index() == 0:
        with open(out_path, "wb") as f:
            f.write(out)
        return {
            "raw_bytes": len(data),
            "compressed_bytes": len(out),
            "hosts": jax.process_count(),
        }
    return {}
