"""Benchmark: the codec family on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The headline metric is huffman-2 device encode GB/s per chip;
``vs_baseline`` divides it by the 5 GB/s/chip north-star target from
BASELINE.json (the reference publishes no numbers — BASELINE.md).
``detail`` carries the full breadth: decode, arity 3/16, the serial
scan codecs (nybble, small_byte), and end-to-end host↔device wall
numbers including framing.

Corpus: enwik8 is not fetchable in this zero-egress container, so the
input is synthetic English-like text with enwik8-like symbol statistics
(Zipf-weighted letters; entropy ~4.2 bits/byte).

Methodology: this container reaches the chip through a loopback relay
whose per-dispatch round trip is tens of ms, so naive
dispatch+block_until_ready timing measures relay latency, not device
throughput.  Device numbers are measured over a DEPENDENT CHAIN of
kernel invocations (each iteration's input derives from the previous
output) so dispatches pipeline and the relay latency amortizes away —
equivalent to steady-state batch processing on a host-attached TPU.
Two traps this file deliberately avoids (measured, see git history):
(1) arrays CLOSED OVER by a jitted step become jit constants that the
relay re-uploads every call (~1.5 ms per 128 KB) — all table/metadata
arrays ride as explicit arguments; (2) at 8 MiB a fused kernel sits on
the ~30 us dispatch floor — headline numbers use 64 MiB inputs.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

HEADLINE_MB = 64
SMALL_MB = 8
SCAN_MB = 2  # serial scan codecs: one lax.scan step per byte


def make_corpus(nbytes: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    # enwik8-ish: letters + space + punctuation + markup chars, zipfish
    alphabet = np.frombuffer(
        b" etaoinshrdlcumwfgypbvk'\"<>/=.,;:[]|()&#x1230984756-_\nqjzETAOINSHR",
        np.uint8,
    )
    ranks = np.arange(1, alphabet.size + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    return rng.choice(alphabet, size=nbytes, p=probs).tobytes()


def _force(x):
    """Force the chain's tail to be COMPUTED, not just scheduled: fetch
    one element to host.  On this relay platform block_until_ready has
    been observed returning early for large buffers (64 MiB chains
    'finishing' at 2+ TB/s), so readiness is established by data."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf[(0,) * leaf.ndim])


def time_chain(step, x0, *extra, iters=12, trials=3):
    """Best per-iteration time of a dependent chain x -> step(x, *extra).

    ``extra`` (tables, metadata) MUST ride as explicit arguments: arrays
    closed over by a jitted step become jit constants, and on a
    relay-attached platform every dispatch re-uploads them (~1.5 ms per
    128 KB measured) — which silently dominates sub-ms kernels.

    The chain length self-calibrates until one trial spans >= 0.25 s so
    the end-of-chain forcing fetch (a relay round trip) amortizes away.
    """
    x = step(x0, *extra)
    _force(x)  # compile + warm
    while True:
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x, *extra)
        _force(x)
        dt = time.perf_counter() - t0
        if dt >= 0.25 or iters >= 4096:
            break
        iters = min(
            4096, max(iters * 2, int(iters * 0.3 / max(dt, 1e-9)))
        )
    best = dt / iters
    for _ in range(trials - 1):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x, *extra)
        _force(x)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def measure_envelope():
    """Chained elementwise read+write bandwidth — the platform envelope
    codec numbers can be normalized against across rounds/platforms."""
    import jax
    import jax.numpy as jnp

    z = jnp.asarray(np.arange(64 * 1024 * 1024 // 4, dtype=np.int32))

    @jax.jit
    def dbl(a):
        return a * 2 + 1

    per = time_chain(dbl, z, iters=16, trials=3)
    return 2 * z.size * 4 / per / 1e9  # read+write GB/s


def _prep_huffman(data: bytes, arity: int):
    """Host side: blocks, per-block canonical tables, device arrays."""
    import jax.numpy as jnp

    from data_compression_tpu import framing
    from data_compression_tpu.config import ARITY_MAX_LEN
    from data_compression_tpu.huffman.canonical import lengths_to_codes
    from data_compression_tpu.models.huffman import capped_lengths
    from data_compression_tpu.ops.pallas.encode_kernel import (
        CHUNK_SYMS,
        LANES,
        MAXLEN_BUCKETS,
        prep_tables,
    )

    blocks, lengths = framing.split_blocks(data, 65536)
    B = blocks.shape[0]
    hists = np.stack(
        [np.bincount(blocks[i, : lengths[i]], minlength=256) for i in range(B)]
    ).astype(np.int64)
    tables = [
        lengths_to_codes(capped_lengths(hists[i], arity), arity)
        for i in range(B)
    ]
    actual_max = max(int(t.max_len) for t in tables)
    maxlen = min(
        next((m for m in MAXLEN_BUCKETS if m >= actual_max),
             ARITY_MAX_LEN[arity]),
        ARITY_MAX_LEN[arity],
    )
    dense, count = prep_tables(tables, arity)
    meta = np.stack([count, lengths.astype(np.int32)], axis=1).astype(np.int32)
    syms_t = jnp.transpose(
        jnp.asarray(blocks).reshape(B, LANES, CHUNK_SYMS), (0, 2, 1)
    )
    return (blocks, lengths, tables, syms_t, jnp.asarray(dense),
            jnp.asarray(meta), maxlen)


def bench_huffman_encode(data: bytes, arity: int):
    import jax
    import jax.numpy as jnp

    from data_compression_tpu.config import ARITY_DIGITS_PER_BYTE
    from data_compression_tpu.ops.pallas.encode_kernel import (
        CHUNK_SYMS,
        _encode_pallas,
    )

    _, _, _, syms_t, dn, mt, maxlen = _prep_huffman(data, arity)

    @jax.jit
    def encode_step(s, dn, mt):
        # chain mix: xor a slice of the output back into the input —
        # rows past each chunk's nbytes are undefined, which is fine:
        # the chain only needs the data dependency, not the values
        byts, nb = _encode_pallas(s, dn, mt, arity=arity, maxlen=maxlen)
        return s ^ (byts[:, :CHUNK_SYMS, :] & 0x7F)

    best = time_chain(encode_step, syms_t, dn, mt)

    byts0, nb0 = _encode_pallas(syms_t, dn, mt, arity=arity, maxlen=maxlen)
    total_digits = np.asarray(nb0).reshape(-1)
    comp = int((-(-total_digits // ARITY_DIGITS_PER_BYTE[arity])).sum())
    return len(data) / best / 1e9, comp / len(data)


def bench_huffman2_decode(data: bytes):
    import jax

    from data_compression_tpu.ops.pallas import decode_kernel as dk
    from data_compression_tpu.ops.pallas.encode_kernel import (
        LANES,
        encode_blocks_pallas,
    )
    import jax.numpy as jnp

    blocks, lengths, tables, _, _, _, _ = _prep_huffman(data, 2)
    B = blocks.shape[0]
    out0, nb_chunks, _ = encode_blocks_pallas(
        jnp.asarray(blocks), lengths, tables, 2
    )
    packed_np, nb_np = np.asarray(out0), np.asarray(nb_chunks)
    payloads = [
        [
            packed_np[b * LANES + c, : nb_np[b * LANES + c]].tobytes()
            for c in range(LANES)
        ]
        for b in range(B)
    ]
    payload_t, dl, db, dsym, dmeta = dk.prep_decode_inputs(payloads, tables)

    @jax.jit
    def decode_step(p, dl, db, dsym, dmeta):
        out = dk._decode_pallas(p, dl, db, dsym, dmeta)  # [NC, 8C, 128]
        mix = jnp.tile(out, (1, p.shape[1] // out.shape[1] + 1, 1))[
            :, : p.shape[1], :
        ]
        return p ^ mix

    dbest = time_chain(decode_step, payload_t, dl, db, dsym, dmeta)
    return len(data) / dbest / 1e9


def bench_nybble_decode(data: bytes):
    """Device scan decode of the MTF nybble codec (one scan step per
    output byte; parallel across block lanes)."""
    import jax
    import jax.numpy as jnp

    from data_compression_tpu.models.nybble import encode_host
    from data_compression_tpu.ops import scan_codecs as sc
    from data_compression_tpu import framing

    blocks, lengths = framing.split_blocks(data, 65536)
    payloads = [
        encode_host(blocks[i, : lengths[i]].tobytes())
        for i in range(blocks.shape[0])
    ]
    S = 65536
    # type byte stripped: lane payload[0] is the verbatim first byte
    P = -(-max(len(p) - 1 for p in payloads) // 512) * 512
    pay = np.zeros((len(payloads), P), np.uint8)
    for i, p in enumerate(payloads):
        body = np.frombuffer(p, np.uint8)[1:]
        pay[i, : body.size] = body
    payj = jnp.asarray(pay.astype(np.int32))
    rls = jnp.asarray(np.asarray(lengths, np.int32))

    @jax.jit
    def step(p, rls):
        out = sc._decode_batch(p, rls, S)
        return p ^ (out[:, : p.shape[1]] & 1)

    best = time_chain(step, payj, rls, iters=2, trials=2)
    return len(data) / best / 1e9


def bench_small_byte_decode(data: bytes):
    import jax
    import jax.numpy as jnp

    from data_compression_tpu.models.small import small_byte_encode_host
    from data_compression_tpu.ops import scan_codecs as sc
    from data_compression_tpu import framing

    blocks, lengths = framing.split_blocks(data, 65536)
    payloads = [
        small_byte_encode_host(blocks[i, : lengths[i]].tobytes())
        for i in range(blocks.shape[0])
    ]
    S = 65536
    P = -(-max(len(p) for p in payloads) // 512) * 512
    pay = np.zeros((len(payloads), P), np.uint8)
    for i, p in enumerate(payloads):
        pay[i, : len(p)] = np.frombuffer(p, np.uint8)
    payj = jnp.asarray(pay.astype(np.int32))
    plens = jnp.asarray(np.asarray([len(p) for p in payloads], np.int32))
    rls = jnp.asarray(np.asarray(lengths, np.int32))

    @jax.jit
    def step(p, plens, rls):
        out = sc._small_byte_decode_batch(p, plens, rls, S)
        return p ^ (out[:, : p.shape[1]] & 1)

    best = time_chain(step, payj, plens, rls, iters=2, trials=2)
    return len(data) / best / 1e9


def bench_end_to_end(data: bytes):
    """compress() + decompress() wall time: host split/histogram/table
    build, device kernels, framing pack/unpack, CRC — what a user of
    the file API actually gets."""
    import data_compression_tpu as dct

    cfg = dct.CodecConfig(codec="huffman", arity=2)
    blob = dct.compress(data, cfg)  # warm compiles
    out = dct.decompress(blob)
    assert out == data
    t0 = time.perf_counter()
    blob = dct.compress(data, cfg)
    t1 = time.perf_counter()
    out = dct.decompress(blob)
    t2 = time.perf_counter()
    assert out == data
    return len(data) / (t1 - t0) / 1e9, len(data) / (t2 - t1) / 1e9


def main() -> int:
    import jax

    arity = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else HEADLINE_MB
    nbytes = mb * 1024 * 1024

    data = make_corpus(nbytes)
    gbps, ratio = bench_huffman_encode(data, arity)
    detail = {
        "input_mb": mb,
        "ratio": round(ratio, 4),
        "path": "pallas",
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "note": "dependent-chain timing, tables passed as args "
        "(closure constants re-upload per dispatch on this relay)",
    }

    if arity == 2:
        detail["decode_device_gbps"] = round(bench_huffman2_decode(data), 3)
        small = make_corpus(SMALL_MB * 1024 * 1024, seed=1)
        for a in (3, 16):
            g, r = bench_huffman_encode(small, a)
            detail[f"huffman{a}_encode_gbps"] = round(g, 3)
            detail[f"huffman{a}_ratio"] = round(r, 4)
        scan = make_corpus(SCAN_MB * 1024 * 1024, seed=2)
        try:
            detail["nybble_decode_device_gbps"] = round(
                bench_nybble_decode(scan), 4
            )
        except Exception as e:  # pragma: no cover
            detail["nybble_decode_device_gbps"] = f"error: {e}"
        try:
            detail["small_byte_decode_device_gbps"] = round(
                bench_small_byte_decode(scan), 4
            )
        except Exception as e:  # pragma: no cover
            detail["small_byte_decode_device_gbps"] = f"error: {e}"
        e2e = make_corpus(SMALL_MB * 1024 * 1024, seed=3)
        ce, cd = bench_end_to_end(e2e)
        detail["e2e_compress_gbps"] = round(ce, 3)
        detail["e2e_decompress_gbps"] = round(cd, 3)

    detail["platform_copy_gbps"] = round(measure_envelope(), 2)
    detail["fraction_of_copy_bw"] = round(
        gbps / max(detail["platform_copy_gbps"], 1e-9), 4
    )

    result = {
        "metric": f"huffman{arity}_encode_gbps_per_chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 5.0, 4),
        "detail": detail,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
