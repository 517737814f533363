"""Command-line interface.

The reference's only driver is ``main()`` filtering stdin→stdout
(n_ary_huffman.c:2893-2906).  This CLI covers the same streaming use
plus file mode, codec/arity selection and stream inspection.

Usage:
  python -m data_compression_tpu compress   [-c CODEC] [-n ARITY] [opts] IN OUT
  python -m data_compression_tpu decompress IN OUT
  python -m data_compression_tpu roundtrip  [-c CODEC] [-n ARITY] IN
  python -m data_compression_tpu info       IN
  (use '-' for stdin/stdout)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from data_compression_tpu import api, framing
from data_compression_tpu.config import CODEC_IDS, CodecConfig


def _read(path: str) -> bytes:
    if path == "-":
        return sys.stdin.buffer.read()
    with open(path, "rb") as f:
        return f.read()


def _open_in(path: str):
    return sys.stdin.buffer if path == "-" else open(path, "rb")


def _open_out(path: str):
    return sys.stdout.buffer if path == "-" else open(path, "wb")


def _write(path: str, data: bytes) -> None:
    if path == "-":
        sys.stdout.buffer.write(data)
        sys.stdout.buffer.flush()
    else:
        with open(path, "wb") as f:
            f.write(data)


def _config(args) -> CodecConfig:
    return CodecConfig(
        codec=args.codec,
        arity=args.arity,
        block_size=args.block_size,
        chunk_syms=args.chunk_syms,
        shared_table=args.shared_table,
        use_device=not args.no_device,
        isprint_literal=getattr(args, "isprint_literal", False),
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="data_compression_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_codec_flags(sp):
        sp.add_argument("-c", "--codec", default="huffman", choices=sorted(CODEC_IDS))
        sp.add_argument("-n", "--arity", type=int, default=2,
                        help="huffman arity, 2-64 (2/3/16 have device "
                        "fast paths; other n ride the host path)")
        sp.add_argument("--block-size", type=int, default=64 * 1024)
        sp.add_argument("--chunk-syms", type=int, default=512)
        sp.add_argument("--shared-table", action="store_true")
        sp.add_argument("--no-device", action="store_true", help="host (numpy) path")
        sp.add_argument(
            "--isprint-literal", action="store_true",
            help="small_byte: ISPRINT_IS_ALWAYS_LITERAL (0x1f) block "
            "mode for all-printable blocks (small_compression.c:36)",
        )
        sp.add_argument(
            "--stats", action="store_true",
            help="serial codecs (nybble/small_*): print per-context "
            "prediction/dictionary hit rates after compress (the "
            "reference's times_used_directly counters, "
            "nybble_compression.c:543); routes encode through the "
            "host path",
        )

    sp = sub.add_parser("compress", help="compress IN to OUT")
    add_codec_flags(sp)
    sp.add_argument(
        "--printable", action="store_true",
        help="emit the in-band printable container (every block payload "
        "an independent Z85 span; the reference's reserved '_' mode, "
        "small_compression.c:35-40); streams one armored container per "
        "frame, so unbounded inputs work",
    )
    sp.add_argument(
        "--batch-blocks",
        type=int,
        default=api.DEFAULT_BATCH_BLOCKS,
        help="blocks resident per streamed batch (bounds memory; the "
        "streaming analogue of the reference's 65,000-byte stdin loop)",
    )
    sp.add_argument("input")
    sp.add_argument("output")

    sp = sub.add_parser("decompress", help="decompress IN to OUT")
    sp.add_argument("--chunk-syms", type=int, default=512)
    sp.add_argument("--no-device", action="store_true")
    sp.add_argument("input")
    sp.add_argument("output")

    sp = sub.add_parser("roundtrip", help="compress+decompress+verify IN")
    add_codec_flags(sp)
    sp.add_argument("input")

    sp = sub.add_parser("info", help="print stream header as JSON")
    sp.add_argument("input")

    sp = sub.add_parser(
        "armor", help="encode bytes as printable text (base64url, z85 or ascii85)"
    )
    sp.add_argument("-a", "--alphabet", default="base64url",
                    choices=["base64url", "z85", "ascii85"])
    sp.add_argument("input")
    sp.add_argument("output")

    sp = sub.add_parser("dearmor", help="decode printable armor to bytes")
    sp.add_argument("input")
    sp.add_argument("output")

    args = p.parse_args(argv)

    if args.cmd == "compress":
        # Streamed: holds at most batch_blocks x block_size resident,
        # so 1 GB+ inputs (and unbounded stdin) never double in RAM —
        # printable output armors each frame independently.
        stats = None
        if getattr(args, "stats", False):
            if args.codec not in api.STATS_CODECS:
                print(
                    f"--stats supports codecs {api.STATS_CODECS}; "
                    f"ignored for {args.codec}",
                    file=sys.stderr,
                )
            else:
                from data_compression_tpu.utils.debug import CodecStats

                stats = CodecStats(16 if args.codec == "nybble" else 32)
        fin, fout = _open_in(args.input), _open_out(args.output)
        try:
            t0 = time.perf_counter()
            st = api.compress_stream(
                fin, fout, _config(args), batch_blocks=args.batch_blocks,
                printable=args.printable, stats=stats,
            )
            dt = time.perf_counter() - t0
        finally:
            if args.input != "-":
                fin.close()
            if args.output != "-":
                fout.close()
            else:
                fout.flush()
        print(
            f"{st['raw_bytes']} -> {st['compressed_bytes']} bytes "
            f"(ratio {st['ratio']:.4f}, {dt:.3f}s, "
            f"{st['raw_bytes']/max(dt,1e-9)/1e6:.1f} MB/s, "
            f"{st['frames']} frame(s))",
            file=sys.stderr,
        )
        if stats is not None:
            print(f"stats: {stats.summary()}", file=sys.stderr)
        return 0

    if args.cmd == "decompress":
        # read_frame auto-detects binary vs printable containers per
        # frame, so both (and mixed streams) decompress streamed.
        cfg = CodecConfig(chunk_syms=args.chunk_syms, use_device=not args.no_device)
        fin, fout = _open_in(args.input), _open_out(args.output)
        try:
            t0 = time.perf_counter()
            st = api.decompress_stream(fin, fout, cfg)
            dt = time.perf_counter() - t0
        finally:
            if args.input != "-":
                fin.close()
            if args.output != "-":
                fout.close()
            else:
                fout.flush()
        print(
            f"{st['compressed_bytes']} -> {st['raw_bytes']} bytes ({dt:.3f}s)",
            file=sys.stderr,
        )
        return 0

    if args.cmd == "roundtrip":
        data = _read(args.input)
        cfg = _config(args)
        out = api.compress(data, cfg)
        back = api.decompress(out, cfg)
        ok = back == data
        print(
            f"{'OK' if ok else 'MISMATCH'}: {len(data)} -> {len(out)} "
            f"(ratio {len(out)/max(1,len(data)):.4f})",
            file=sys.stderr,
        )
        return 0 if ok else 1

    if args.cmd == "armor":
        from data_compression_tpu.utils import base64url as b64

        data = _read(args.input)
        enc = {"base64url": b64.armor, "z85": b64.z85_armor,
               "ascii85": b64.ascii85_armor}[args.alphabet]
        _write(args.output, enc(data).encode("ascii"))
        return 0

    if args.cmd == "dearmor":
        from data_compression_tpu.utils import base64url as b64

        text = _read(args.input).decode("ascii")
        if text.startswith("DCZ:"):
            out = b64.z85_dearmor(text)
        elif text.startswith("DCA:"):
            out = b64.ascii85_dearmor(text)
        else:
            out = b64.dearmor(text)
        _write(args.output, out)
        return 0

    if args.cmd == "info":
        # Streamed containers are frame concatenations; summarize all.
        fin = _open_in(args.input)
        try:
            frames = []
            while True:
                fb = framing.read_frame(fin)
                if fb is None:
                    break
                frames.append(framing.unpack_frame(fb))
        finally:
            if args.input != "-":
                fin.close()
        if not frames:
            print(json.dumps({"error": "no frames"}))
            return 1
        f0 = frames[0]
        print(
            json.dumps(
                {
                    "codec": f0.codec_name,
                    "arity": f0.arity,
                    "block_size": f0.block_size,
                    "frames": len(frames),
                    "total_len": sum(f.total_len for f in frames),
                    "num_blocks": sum(len(f.entries) for f in frames),
                    "shared_table": f0.shared_table is not None,
                    "literal_blocks": sum(
                        e.is_literal for f in frames for e in f.entries
                    ),
                    "compressed_bytes": sum(
                        e.comp_len for f in frames for e in f.entries
                    ),
                }
            )
        )
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
