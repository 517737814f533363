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


def compress_multihost_bytes(data: bytes, config) -> bytes:
    """Compress cooperatively across all processes; every host calls
    this with the SAME data (or reads the same file) and receives the
    identical framed stream.

    Differences from the single-controller pipeline: the global
    [B, S] array is assembled with ``jax.make_array_from_process_local_
    data`` (each host contributes the contiguous row range its devices
    own), the encode step's outputs come back fully replicated (the
    payload allgather rides DCN), and every host then assembles the
    identical frame — host 0 is only special for file writing.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from data_compression_tpu import framing
    from data_compression_tpu.huffman.canonical import lengths_to_codes
    from data_compression_tpu.models.huffman import _pack_payload, capped_lengths
    from data_compression_tpu.ops.encode_fast import pack_encode_table
    from data_compression_tpu.ops.huffman_coding import encode_chunks, max_chunk_bytes
    from data_compression_tpu.utils.crc import crc32

    assert config.codec == "huffman"
    S = config.block_size
    C = config.chunk_syms
    ncb = S // C
    arity = config.arity

    blocks, lengths = framing.split_blocks(data, S)
    B_real = blocks.shape[0]
    nproc = jax.process_count()
    ndev = len(jax.devices())
    Bp = max(-(-max(B_real, 1) // ndev) * ndev, ndev)
    pb = np.zeros((Bp, S), np.uint8)
    pb[:B_real] = blocks
    pl_ = np.zeros(Bp, np.int32)
    pl_[:B_real] = lengths

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()).reshape(ndev, 1), ("data", "chunk"))
    dp = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())

    # contiguous ownership: host p's devices hold rows [p*Bp/nproc, ...)
    per = Bp // nproc
    p = jax.process_index()
    local_rows = pb[p * per : (p + 1) * per]
    blocks_g = jax.make_array_from_process_local_data(dp, local_rows, (Bp, S))
    lengths_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), pl_, (Bp,)
    )

    # histogram step (replicated out) -> host tables -> encode step
    @functools_partial_jit(in_shardings=(dp, rep), out_shardings=rep)
    def hist_step(blk, lens):
        from data_compression_tpu.ops.histogram import block_histograms

        return block_histograms(blk, lens)

    hists = np.asarray(hist_step(blocks_g, lengths_g)).astype(np.int64)
    tables = [
        lengths_to_codes(capped_lengths(hists[i], arity), arity) for i in range(Bp)
    ]
    pt, bt = zip(*[pack_encode_table(t) for t in tables])

    @functools_partial_jit(in_shardings=(dp, rep, rep, rep), out_shardings=(rep, rep))
    def enc_step(blk, lens, ptab, btab):
        from data_compression_tpu.ops.encode_fast import encode_chunks_fast

        Bx, Sx = blk.shape
        syms = blk.reshape(Bx * ncb, C)
        counts = jnp.clip(
            lens[:, None] - jnp.arange(ncb, dtype=lens.dtype)[None, :] * C, 0, C
        ).reshape(-1)
        tbl = jnp.broadcast_to(
            jnp.arange(Bx, dtype=jnp.int32)[:, None], (Bx, ncb)
        ).reshape(-1)
        pk, nb, _ = encode_chunks_fast(
            syms, counts, ptab, btab, tbl, arity=arity, chunk_syms=C
        )
        return pk, nb

    packed, nbytes = enc_step(
        blocks_g,
        lengths_g,
        jax.make_array_from_process_local_data(rep, np.stack(pt), (Bp, 256)),
        jax.make_array_from_process_local_data(rep, np.stack(bt), (Bp, 256)),
    )
    packed = np.asarray(packed)  # replicated: full result on every host
    nbytes = np.asarray(nbytes)

    payloads, raw_lens, crcs, flags = [], [], [], []
    for i in range(B_real):
        raw_len = int(pl_[i])
        nc_real = max(1, -(-raw_len // C))
        chunks = [
            packed[i * ncb + c, : int(nbytes[i * ncb + c])].tobytes()
            for c in range(nc_real)
        ]
        payload = _pack_payload(tables[i].to_bytes(), chunks)
        raw = pb[i, :raw_len].tobytes()
        crcs.append(crc32(raw))
        raw_lens.append(raw_len)
        if len(payload) >= raw_len:
            payloads.append(raw)
            flags.append(framing.BLOCK_LITERAL)
        else:
            payloads.append(payload)
            flags.append(0)
    return framing.pack_frame(
        config.codec_id, arity, S, len(data), payloads, raw_lens, crcs, flags,
        chunk_log2=C.bit_length() - 1,
    )


def functools_partial_jit(**kw):
    import functools

    def deco(f):
        return jax.jit(f, **kw)

    return deco


def compress_multihost(local_data_path: str, out_path: str, config) -> dict:
    """File driver: every host calls with the same args; host 0 writes."""
    with open(local_data_path, "rb") as f:
        data = f.read()
    out = compress_multihost_bytes(data, config)
    if jax.process_index() == 0:
        with open(out_path, "wb") as f:
            f.write(out)
        return {
            "raw_bytes": len(data),
            "compressed_bytes": len(out),
            "hosts": jax.process_count(),
        }
    return {}
