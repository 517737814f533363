"""Benchmark: n-ary Huffman encode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured GB/s divided by the 5 GB/s/chip north-star
target from BASELINE.json (the reference publishes no numbers —
BASELINE.md).

Corpus: enwik8 is not fetchable in this zero-egress container, so the
input is synthetic English-like text with enwik8-like symbol statistics
(Zipf-weighted letters; entropy ~4.2 bits/byte).  Timing covers the
device encode step (histogram + table gather + digit placement + pack)
with blocks device-resident and canonical tables prebuilt — the
steady-state per-batch device cost; host table build (microseconds per
256-symbol table) overlaps the previous batch in the pipeline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


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


def measure_envelope():
    """Platform reality check: this container reaches the chip through a
    loopback relay that executes far below real v5e speed (measured
    ~0.013 TFLOPs matmul, ~1 GB/s memory copy).  Reporting the measured
    elementwise-copy bandwidth alongside the codec number lets results
    be normalized across rounds/platforms."""
    import jax
    import jax.numpy as jnp

    z = jnp.asarray(np.arange(16 * 1024 * 1024 // 4, dtype=np.int32))

    @jax.jit
    def dbl(a):
        return a * 2 + 1

    jax.block_until_ready(dbl(z))
    t0 = time.perf_counter()
    for _ in range(5):
        r = dbl(z)
    _ = int(r[0])
    per = (time.perf_counter() - t0) / 5
    return 2 * z.size * 4 / per / 1e9  # read+write GB/s


def main() -> int:
    import jax
    import jax.numpy as jnp

    from data_compression_tpu import framing
    from data_compression_tpu.config import CodecConfig
    from data_compression_tpu.huffman.canonical import lengths_to_codes
    from data_compression_tpu.models.huffman import capped_lengths
    from data_compression_tpu.parallel.mesh import make_mesh
    from data_compression_tpu.parallel.pipeline import (
        make_sharded_encode_step,
        make_sharded_hist_step,
    )

    arity = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path = sys.argv[3] if len(sys.argv) > 3 else "pallas"
    nbytes = mb * 1024 * 1024

    data = make_corpus(nbytes)
    blocks, lengths = framing.split_blocks(data, 65536)
    B = blocks.shape[0]

    hists = np.stack(
        [np.bincount(blocks[i, : lengths[i]], minlength=256) for i in range(B)]
    ).astype(np.int64)
    tables = [lengths_to_codes(capped_lengths(hists[i], arity), arity) for i in range(B)]

    if path == "pallas":
        from data_compression_tpu.ops.pallas.encode_kernel import (
            encode_blocks_pallas,
        )

        blocks_d = jnp.asarray(blocks)

        def run():
            out, nb, nd = encode_blocks_pallas(blocks_d, lengths, tables, arity)
            return out, nb
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from data_compression_tpu.ops.encode_fast import pack_encode_table

        mesh = make_mesh()
        dp = NamedSharding(mesh, P("data", None))
        rep = NamedSharding(mesh, P())
        blocks_d = jax.device_put(jnp.asarray(blocks), dp)
        lengths_d = jax.device_put(jnp.asarray(lengths, jnp.int32), rep)
        enc_step = make_sharded_encode_step(mesh, arity, 1024)
        pt, bt = zip(*[pack_encode_table(t) for t in tables])
        packed_tab = jax.device_put(jnp.asarray(np.stack(pt)), rep)
        bits_tab = jax.device_put(jnp.asarray(np.stack(bt)), rep)

        def run():
            return enc_step(blocks_d, lengths_d, packed_tab, bits_tab)

    # warmup / compile
    jax.block_until_ready(run())
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    gbps = nbytes / best / 1e9

    _, nb = run()[:2]
    comp_bytes = int(np.asarray(nb).sum())
    ratio = comp_bytes / nbytes
    copy_bw = measure_envelope()

    # decode: device-resident kernel timing (host<->device transfer in
    # this container is tunnel-bound and not representative)
    decode_gbps = None
    if path == "pallas" and arity == 2:
        from data_compression_tpu.huffman.canonical import build_decode_tables
        from data_compression_tpu.ops.pallas import decode_kernel as dk
        from data_compression_tpu.ops.pallas.encode_kernel import LANES

        out0, nb0 = run()[:2]
        packed_np, nb_np = np.asarray(out0), np.asarray(nb0)
        pay = np.zeros((B * LANES, dk.MBP), np.uint8)
        pay[np.arange(dk.MBP)[None, :] < nb_np[:, None]] = np.concatenate(
            [packed_np[k, : nb_np[k]] for k in range(B * LANES)]
        )
        payload_t = jnp.transpose(
            jnp.asarray(pay.reshape(B, LANES, dk.MBP)), (0, 2, 1)
        )
        limit = np.zeros((B, 1, dk.L + 1), np.int32)
        bmf = np.zeros((B, 1, dk.L + 1), np.int32)
        symt = np.zeros((B, 1, 256), np.int32)
        for b, t in enumerate(tables):
            d = build_decode_tables(t, pad_to=dk.L)
            limit[b, 0] = d["limit_scaled"]
            bmf[b, 0] = d["base_minus_first"]
            symt[b, 0] = d["symbols"]
        meta = np.zeros((B, 1, 2), np.int32)
        meta[:, 0, 0] = lengths.astype(np.int32)
        dargs = (
            payload_t,
            jnp.asarray(limit),
            jnp.asarray(bmf),
            jnp.asarray(symt),
            jnp.asarray(meta),
        )
        jax.block_until_ready(dargs)
        jax.block_until_ready(dk._decode_pallas(*dargs))
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(dk._decode_pallas(*dargs))
            dts.append(time.perf_counter() - t0)
        decode_gbps = nbytes / min(dts) / 1e9

    result = {
        "metric": f"huffman{arity}_encode_gbps_per_chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 5.0, 4),
        "detail": {
            "input_mb": mb,
            "best_s": round(best, 5),
            "ratio": round(ratio, 4),
            "blocks": B,
            "path": path,
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "platform_copy_gbps": round(copy_bw, 3),
            "fraction_of_copy_bw": round(gbps / max(copy_bw, 1e-9), 4),
            "decode_device_gbps": round(decode_gbps, 4) if decode_gbps else None,
            "note": "tunnel executes ~1000x below real v5e (measured); "
            "fraction_of_copy_bw normalizes for platform speed",
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
