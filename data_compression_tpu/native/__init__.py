"""ctypes bindings for the native CPU runtime (libdctpu.c).

Builds lazily with the system compiler on first use (no pip deps; the
environment bans installs and pybind11 is unavailable, so the binding
layer is plain ctypes per SURVEY.md §2.5).  Falls back gracefully: all
callers must treat ``load() is None`` as "use the pure-Python path".
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "libdctpu.c")
# DCTPU_NATIVE_LIB overrides the library path (e.g. the ASan build from
# `make native-asan`)
_SO = os.environ.get("DCTPU_NATIVE_LIB") or os.path.join(_HERE, "libdctpu.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "cc",
        "-O3",
        "-march=native",
        "-fopenmp",  # batch drivers parallelize across blocks
        "-shared",
        "-fPIC",
        "-o",
        _SO,
        _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode == 0:
            return True
        # toolchains without libgomp: retry serial
        cmd.remove("-fopenmp")
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.dct_crc32.restype = ctypes.c_uint32
        lib.dct_crc32.argtypes = [u8p, i64, ctypes.c_uint32]
        lib.dct_nybble_encode.restype = i64
        lib.dct_nybble_encode.argtypes = [u8p, i64, u8p, i64]
        lib.dct_nybble_decode.restype = i64
        lib.dct_nybble_decode.argtypes = [u8p, i64, u8p, i64]
        lib.dct_small_byte_encode.restype = i64
        lib.dct_small_byte_encode.argtypes = [u8p, i64, u8p, i64]
        lib.dct_small_byte_decode.restype = i64
        lib.dct_small_byte_decode.argtypes = [u8p, i64, u8p, i64]
        lib.dct_small_nybble_encode.restype = i64
        lib.dct_small_nybble_encode.argtypes = [u8p, i64, u8p, i64]
        lib.dct_small_nybble_decode.restype = i64
        lib.dct_small_nybble_decode.argtypes = [u8p, i64, u8p, i64]
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.dct_huffman_capped_lengths_batch.restype = None
        lib.dct_huffman_capped_lengths_batch.argtypes = [
            i64p, i64, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i64p,
        ]
        for name in ("nybble", "small_byte", "small_nybble"):
            f = getattr(lib, f"dct_{name}_encode_batch")
            f.restype = None
            f.argtypes = [u8p, i64p, i64p, u8p, i64, i64p, i64]
            g = getattr(lib, f"dct_{name}_decode_batch")
            g.restype = None
            g.argtypes = [u8p, i64p, i64p, i64p, u8p, i64, i64p, i64]
        lib.dct_huffman_encode_chunk.restype = i64
        lib.dct_huffman_encode_chunk.argtypes = [
            u8p,
            i64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int32),
            u8p,
            i64,
        ]
        lib.dct_huffman_decode_chunk.restype = i64
        lib.dct_huffman_decode_chunk.argtypes = [
            u8p,
            i64,
            i64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            u8p,
        ]
        _lib = lib
        return _lib


def _buf(b: bytes):
    return (ctypes.c_uint8 * len(b)).from_buffer_copy(b) if b else (ctypes.c_uint8 * 1)()


def nybble_encode(src: bytes) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    cap = 2 * len(src) + 16
    out = (ctypes.c_uint8 * cap)()
    n = lib.dct_nybble_encode(_buf(src), len(src), out, cap)
    if n < 0:
        raise ValueError(f"native nybble encode error {n}")
    return ctypes.string_at(out, n)


def nybble_decode(payload: bytes, raw_len: int) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * max(raw_len, 1))()
    n = lib.dct_nybble_decode(_buf(payload), len(payload), out, raw_len)
    if n < 0:
        raise ValueError(f"native nybble decode error {n}")
    return ctypes.string_at(out, n)


def small_byte_encode(src: bytes) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    cap = 2 * len(src) + 16
    out = (ctypes.c_uint8 * cap)()
    n = lib.dct_small_byte_encode(_buf(src), len(src), out, cap)
    if n < 0:
        raise ValueError(f"native small_byte encode error {n}")
    return ctypes.string_at(out, n)


def small_byte_decode(payload: bytes, raw_len: int) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * max(raw_len, 1))()
    n = lib.dct_small_byte_decode(_buf(payload), len(payload), out, raw_len)
    if n < 0:
        raise ValueError(f"native small_byte decode error {n}")
    return ctypes.string_at(out, n)


def small_nybble_encode(src: bytes) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    cap = 2 * len(src) + 16
    out = (ctypes.c_uint8 * cap)()
    n = lib.dct_small_nybble_encode(_buf(src), len(src), out, cap)
    if n < 0:
        raise ValueError(f"native small_nybble encode error {n}")
    return ctypes.string_at(out, n)


def small_nybble_decode(payload: bytes, raw_len: int) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * max(raw_len, 1))()
    n = lib.dct_small_nybble_decode(_buf(payload), len(payload), out, raw_len)
    if n < 0:
        raise ValueError(f"native small_nybble decode error {n}")
    return ctypes.string_at(out, n)


def _i64arr(vals):
    import numpy as np

    return np.ascontiguousarray(vals, np.int64)


def encode_batch(kind: str, blocks, lengths) -> Optional[list]:
    """Encode independent blocks in parallel (OpenMP across blocks).

    ``blocks``: [B, S] uint8 C-contiguous ndarray; ``lengths``: valid
    bytes per block.  Returns per-block payload bytes; raises on the
    first block error (same codes as the single-block wrappers).
    """
    import numpy as np

    lib = load()
    if lib is None:
        return None
    blocks = np.ascontiguousarray(blocks, np.uint8)
    B, S = blocks.shape
    lens = _i64arr(lengths)
    offs = np.arange(B, dtype=np.int64) * S
    stride = 2 * S + 16
    dst = np.empty((B, stride), np.uint8)
    out_len = np.empty(B, np.int64)
    fn = getattr(lib, f"dct_{kind}_encode_batch")
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    fn(
        blocks.ctypes.data_as(u8),
        offs.ctypes.data_as(i64p),
        lens.ctypes.data_as(i64p),
        dst.ctypes.data_as(u8),
        stride,
        out_len.ctypes.data_as(i64p),
        B,
    )
    bad = np.flatnonzero(out_len < 0)
    if bad.size:
        raise ValueError(
            f"native {kind} encode error {int(out_len[bad[0]])} "
            f"(block {int(bad[0])})"
        )
    return [dst[i, : int(out_len[i])].tobytes() for i in range(B)]


def decode_batch(kind: str, payloads, raw_lens) -> Optional[list]:
    """Decode independent payloads in parallel (OpenMP across blocks)."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    B = len(payloads)
    if B == 0:
        return []
    plens = _i64arr([len(p) for p in payloads])
    offs = np.zeros(B, np.int64)
    np.cumsum(plens[:-1], out=offs[1:])
    src = np.frombuffer(b"".join(payloads), np.uint8) if int(
        plens.sum()
    ) else np.zeros(1, np.uint8)
    rls = _i64arr(raw_lens)
    stride = max(1, int(rls.max(initial=1)))
    dst = np.empty((B, stride), np.uint8)
    out_len = np.empty(B, np.int64)
    fn = getattr(lib, f"dct_{kind}_decode_batch")
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    fn(
        np.ascontiguousarray(src).ctypes.data_as(u8),
        offs.ctypes.data_as(i64p),
        plens.ctypes.data_as(i64p),
        rls.ctypes.data_as(i64p),
        dst.ctypes.data_as(u8),
        stride,
        out_len.ctypes.data_as(i64p),
        B,
    )
    bad = np.flatnonzero(out_len < 0)
    if bad.size:
        raise ValueError(
            f"native {kind} decode error {int(out_len[bad[0]])} "
            f"(block {int(bad[0])})"
        )
    return [dst[i, : int(out_len[i])].tobytes() for i in range(B)]


def huffman_capped_lengths_batch(hists, arity: int, cap: int):
    """Per-block canonical Huffman lengths under the per-arity cap —
    bit-identical to models.huffman.capped_lengths over huffman/tree.py
    (differential-tested), OpenMP-parallel across blocks.  ``hists``:
    [B, S<=256] int64.  Returns [B, S] int32 lengths or None."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    hists = np.ascontiguousarray(hists, np.int64)
    B, S = hists.shape
    out = np.empty((B, S), np.int32)
    status = np.empty(B, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.dct_huffman_capped_lengths_batch(
        hists.ctypes.data_as(i64p),
        B,
        S,
        arity,
        cap,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(i64p),
    )
    bad = np.flatnonzero(status < 0)
    if bad.size:
        raise ValueError(
            f"native huffman lengths error {int(status[bad[0]])} "
            f"(block {int(bad[0])})"
        )
    return out


def crc32(data: bytes, seed: int = 0) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    return int(lib.dct_crc32(_buf(data), len(data), seed))


def huffman_encode_chunk(syms, packed_tab, bits_tab, arity: int) -> Optional[bytes]:
    """syms: uint8 ndarray; tables from ops.encode_fast.pack_encode_table."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    syms = np.ascontiguousarray(syms, np.uint8)
    pt = np.ascontiguousarray(packed_tab, np.uint32)
    bt = np.ascontiguousarray(bits_tab, np.int32)
    cap = 4 * max(1, syms.size) + 64
    out = (ctypes.c_uint8 * cap)()
    n = lib.dct_huffman_encode_chunk(
        syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        syms.size,
        arity,
        pt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        bt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out,
        cap,
    )
    if n < 0:
        raise ValueError(f"native huffman encode error {n}")
    return ctypes.string_at(out, n)


def huffman_decode_chunk(payload: bytes, count: int, dec_tables, arity: int, L: int):
    """dec_tables: dict from huffman.canonical.build_decode_tables."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    limit = np.ascontiguousarray(dec_tables["limit_scaled"], np.int64)
    bmf = np.ascontiguousarray(dec_tables["base_minus_first"], np.int64)
    symbols = np.ascontiguousarray(dec_tables["symbols"], np.int32)
    out = (ctypes.c_uint8 * max(count, 1))()
    n = lib.dct_huffman_decode_chunk(
        _buf(payload),
        len(payload),
        count,
        arity,
        L,
        limit.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bmf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out,
    )
    if n < 0:
        raise ValueError(f"native huffman decode error {n}")
    return np.frombuffer(ctypes.string_at(out, count), np.uint8)
