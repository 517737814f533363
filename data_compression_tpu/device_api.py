"""Device-resident compression pipeline: zero host round trips.

`api.compress` serves host-resident bytes; its wall time on a
relay-attached chip is dominated by the host<->device link
(docs/E2E.md).  This module serves the TPU-native producer whose data
already lives in HBM (checkpoint shards, activation dumps, on-chip
logs): the whole compress pipeline — per-block histogram, on-device
Huffman tree build (ops/table_build.py), canonical code assignment,
dense-table layout, fused Pallas encode, payload compaction — runs as
TWO compiled dispatches whose inputs and outputs are device arrays,
with no host synchronization between them (they queue back-to-back;
one single jit compiles, but fusing the tree-build scans with the
Pallas call + 40 MiB compaction into one XLA module blew compile time
past 10 minutes, so the pipeline is split at the tables boundary —
each half compiles in seconds and the split costs no wall time).
`bench.py` reports steady-state throughput as ``e2e_device_gbps`` via
the dependent-chain methodology.

The inverse direction mirrors it: wire length-tables -> on-device
canonical decode tables -> fused Pallas decode, one dispatch.

Wire parity: payload bytes and tables are bit-identical to
`api.compress` (same table builder semantics, differential-tested in
tests/test_device_api.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

from data_compression_tpu.config import (
    ARITY_DIGITS_PER_BYTE,
    ARITY_MAX_LEN,
    CodecConfig,
)

LANES = 128


@functools.lru_cache(maxsize=None)
def _tables_fn(arity: int):
    import jax
    import jax.numpy as jnp

    from data_compression_tpu.ops.histogram import block_histograms
    from data_compression_tpu.ops.table_build import (
        encode_tables_device,
        huffman_lengths_device,
    )

    @jax.jit
    def fn(blocks, raw_lens):
        hists = block_histograms(blocks, raw_lens)
        lengths = huffman_lengths_device(hists.astype(jnp.int32), arity)
        dense, n_used = encode_tables_device(lengths, arity)
        meta = jnp.stack(
            [n_used, raw_lens.astype(jnp.int32)], axis=1
        ).astype(jnp.int32)
        # batch max code length: lets the caller pick a maxlen-bucketed
        # encode kernel (the merge-level capacities scale with it) and
        # verify the bucket at its existing host sync point
        return dense, meta, lengths.astype(jnp.uint8), lengths.max()

    return fn


@functools.lru_cache(maxsize=None)
def _encode_fn(arity: int, chunk_syms: int, out_cap: int,
               interpret: bool = False, maxlen: Optional[int] = None):
    """out_cap: output capacity in BYTES (rounded internally).  All
    fast arities (2/3/16) ride the block-compact formulation (in-VMEM
    chunk concatenation — n=3 with an in-kernel trit->wire-byte repack
    first — + ordered-DMA block compaction at 1024-aligned offsets;
    returned flat is an int32 view of the payload bytes)."""
    import jax
    import jax.numpy as jnp

    D = ARITY_DIGITS_PER_BYTE[arity]

    if arity in (2, 3, 16) and not interpret:
        from data_compression_tpu.ops.pallas.compact_kernel import (
            compact_block_rows,
        )
        from data_compression_tpu.ops.pallas.encode_kernel import (
            _encode_pallas_compact,
        )

        cap_w = -(-out_cap // 4096) * 1024

        @jax.jit
        def fn(blocks, dense, meta):
            B, S = blocks.shape
            syms_t = jnp.transpose(
                blocks.reshape(B, LANES, chunk_syms), (0, 2, 1)
            )
            words, nbd = _encode_pallas_compact(
                syms_t, dense, meta, arity=arity, chunk_syms=chunk_syms,
                maxlen=maxlen,
            )
            Wf = words.shape[2]
            digits = jnp.transpose(nbd, (0, 2, 1)).reshape(B, LANES)
            nb = -(-digits // D)
            block_bytes = nb.sum(axis=1)
            padded_w = -(-block_bytes // 4096) * 1024
            starts_w = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_w)[:-1]]
            ).astype(jnp.int32)
            flat = compact_block_rows(
                words.reshape(B, LANES * Wf), starts_w, cap_w
            )
            return flat, nb

        return fn

    from data_compression_tpu.ops.compaction import compact_rows
    from data_compression_tpu.ops.pallas.encode_kernel import _encode_pallas

    @jax.jit
    def fn(blocks, dense, meta):
        B, S = blocks.shape
        syms_t = jnp.transpose(
            blocks.reshape(B, LANES, chunk_syms), (0, 2, 1)
        )
        byts, nbd = _encode_pallas(
            syms_t, dense, meta, arity=arity, chunk_syms=chunk_syms,
            interpret=interpret, maxlen=maxlen,
        )
        MB = byts.shape[1]
        rows = jnp.transpose(byts, (0, 2, 1)).reshape(B * LANES, MB)
        digits = jnp.transpose(nbd, (0, 2, 1)).reshape(B * LANES)
        nb = -(-digits // D)
        flat = compact_rows(rows, nb, out_cap)
        return flat, nb.reshape(B, LANES)

    return fn


@dataclasses.dataclass
class DeviceCompressed:
    """Device-resident compressed stream: everything needed to frame or
    decode, as device arrays."""

    flat: object  # compacted wire bytes: uint8 tight concatenation, or
    #   (block_aligned) an int32 view with each block's payload at a
    #   1024-byte-aligned offset (cumsum of padded block sizes)
    nb: object  # [B, 128] int32 — per-chunk wire byte counts
    table_lengths: object  # [B, 256] uint8 — per-block wire tables
    raw_lens: np.ndarray  # [B] host — valid bytes per block
    arity: int
    chunk_syms: int
    block_aligned: bool = False

    def total_bytes(self) -> int:
        return int(np.asarray(self.nb).sum())


def compress_blocks_device(
    blocks,  # [B, S] uint8 device array (S = 128 * chunk_syms)
    raw_lens: np.ndarray,
    config: Optional[CodecConfig] = None,
    out_cap: Optional[int] = None,
    interpret: bool = False,
) -> DeviceCompressed:
    """Compress device-resident blocks (two queued dispatches, no host
    sync).  ``out_cap`` bounds the compacted output; when omitted, a
    capacity of the input size is used and the (adversarial-input)
    overflow case retries 2x larger — compressed-bigger-than-raw blocks
    belong to the LITERAL fallback of the framing layer, not this
    pipeline."""
    import jax.numpy as jnp

    from data_compression_tpu.ops.compaction import round_cap

    from data_compression_tpu.ops.pallas.encode_kernel import MAXLEN_BUCKETS

    config = config or CodecConfig()
    arity = config.arity
    B, S = blocks.shape
    C = S // LANES
    aligned = arity in (2, 3, 16) and not interpret
    lens_dev = jnp.asarray(np.asarray(raw_lens, np.int32))
    dense, meta, rows, maxlen_d = _tables_fn(arity)(blocks, lens_dev)
    cap = round_cap(out_cap if out_cap is not None else B * S)
    # maxlen-bucketed kernel (merge-level capacities scale with the
    # batch's max code length; wire output is identical across buckets).
    # This wrapper already syncs on nb, so one extra tiny scalar fetch
    # picks the right bucket up front; the pure two-dispatch chain
    # (bench_e2e_device) passes a profile-derived bucket instead.
    cap_len = ARITY_MAX_LEN[arity]
    actual_max = max(1, int(np.asarray(maxlen_d)))
    maxlen = min(
        next((m for m in MAXLEN_BUCKETS if m >= actual_max), cap_len),
        cap_len,
    )
    while True:
        flat, nb = _encode_fn(arity, C, cap, interpret, maxlen)(
            blocks, dense, meta
        )
        nbh = np.asarray(nb).astype(np.int64)
        if aligned:
            total = int((-(-nbh.sum(axis=1) // 4096) * 4096).sum())
        else:
            total = int(nbh.sum())
        if total <= cap:
            return DeviceCompressed(
                flat=flat, nb=nb, table_lengths=rows,
                raw_lens=np.asarray(raw_lens, np.int64),
                arity=arity, chunk_syms=C, block_aligned=aligned,
            )
        cap = round_cap(2 * cap)


@functools.lru_cache(maxsize=None)
def _decode_fn(arity: int, chunk_syms: int, interpret: bool = False,
               nseg_cap: Optional[int] = None):
    import jax
    import jax.numpy as jnp

    from data_compression_tpu.ops.pallas.decode_kernel import (
        G8,
        _decode_pallas,
    )
    from data_compression_tpu.ops.table_build import decode_tables_device

    L = ARITY_MAX_LEN[arity]

    @jax.jit
    def fn(payload_t, table_rows, meta):
        # table_rows: [BP, 256] uint8 wire lengths (BP = NC * 8)
        BP = table_rows.shape[0]
        NC = BP // G8
        lim, bmf, syms = decode_tables_device(
            table_rows.astype(jnp.int32), arity, L
        )
        bmf_l = jnp.zeros((BP, LANES), jnp.int32).at[:, : L + 1].set(bmf)
        return _decode_pallas(
            payload_t,
            lim.reshape(NC, G8, L + 1),
            bmf_l.reshape(NC, G8, LANES),
            syms.reshape(NC, 2 * G8, LANES).astype(jnp.int32),
            meta,
            chunk_syms=chunk_syms,
            arity=arity,
            interpret=interpret,
            nseg_cap=nseg_cap,
        )

    return fn


def decode_blocks_device(payload_t, table_rows, meta, arity=2, chunk_syms=512,
                         interpret=False, nseg_cap=None):
    """One-dispatch decode: padded payload cells + wire length tables ->
    [NC, 8*C, 128] symbols, all device-resident (n=2 Pallas geometry).
    ``nseg_cap``: static segment bound payload_t was packed to
    (decode_kernel.prep_decode_inputs returns it)."""
    return _decode_fn(arity, chunk_syms, interpret, nseg_cap)(
        payload_t, table_rows, meta
    )
