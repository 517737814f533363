"""Micro-benchmarks for Pallas primitive choices on the attached TPU.

Times small single-purpose kernels over the same [B, C, 128] uint8
symbol tensor the encoder sees, to attribute encode stage-1 cost to
its constituent ops (dtype widening, lane gathers, masking) and pick
the fastest 256-entry table-lookup formulation.  Not part of the
library; run directly: python tools/microbench.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 512
LANES = 128
B = 128  # 8 MiB


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_variant(name, kernel, extra_specs=(), extra_args=()):
    @jax.jit
    def go(s, *extra):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, C, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=pl.BlockSpec((1, C, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C, LANES), jnp.uint8),
        )(s, *extra)

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 256, (B, C, LANES), np.uint8))
    dt = timeit(go, s, *extra_args)
    gbps = B * C * LANES / dt / 1e9
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                      "gbps": round(gbps, 2)}))
    return dt


def main():
    rng = np.random.default_rng(1)
    table32 = jnp.asarray(rng.integers(0, 2**19, (B, 2, LANES), np.int32))
    tspec32 = pl.BlockSpec((1, 2, LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    table8 = jnp.asarray(rng.integers(0, 256, (B, 6, LANES), np.uint8))
    tspec8 = pl.BlockSpec((1, 6, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    table16 = jnp.asarray(rng.integers(0, 2**15, (B, 4, LANES), np.int16))
    tspec16 = pl.BlockSpec((1, 4, LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    # v0: passthrough
    def k0(s_ref, o_ref):
        o_ref[0] = s_ref[0]
    run_variant("passthrough", k0)

    # v1: widen to i32 and back
    def k1(s_ref, o_ref):
        s = s_ref[0].astype(jnp.int32)
        o_ref[0] = (s & 0xFF).astype(jnp.uint8)
    run_variant("widen_i32", k1)

    # v2: current _gather256 (i32 operand rows)
    def k2(s_ref, t_ref, o_ref):
        s = s_ref[0].astype(jnp.int32)
        i7 = s & 127
        lo = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 0:1, :], s.shape), i7, axis=1)
        hi = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 1:2, :], s.shape), i7, axis=1)
        w = jnp.where(s < 128, lo, hi)
        o_ref[0] = (w & 0xFF).astype(jnp.uint8)
    run_variant("gather256_i32", k2, (tspec32,), (table32,))

    # v2b: single 128-entry gather only (isolate one take_along_axis)
    def k2b(s_ref, t_ref, o_ref):
        s = s_ref[0].astype(jnp.int32)
        i7 = s & 127
        lo = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 0:1, :], s.shape), i7, axis=1)
        o_ref[0] = (lo & 0xFF).astype(jnp.uint8)
    run_variant("gather128_i32_single", k2b, (tspec32,), (table32,))

    # v3: gather on uint8 operand (no widening of s; 32x128 vregs)
    def k3(s_ref, t_ref, o_ref):
        s = s_ref[0]  # uint8
        i7 = s & jnp.uint8(127)
        lo = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 0:1, :], s.shape), i7, axis=1)
        hi = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 1:2, :], s.shape), i7, axis=1)
        o_ref[0] = jnp.where(s < 128, lo, hi)
    run_variant("gather256_u8", k3, (tspec8,), (table8,))

    # v3b: three u8 gathers (code lo/hi + digits as bytes)
    def k3b(s_ref, t_ref, o_ref):
        s = s_ref[0]
        i7 = s & jnp.uint8(127)
        acc = None
        for r in range(3):
            lo = jnp.take_along_axis(
                jnp.broadcast_to(t_ref[0, 2 * r:2 * r + 1, :], s.shape),
                i7, axis=1)
            hi = jnp.take_along_axis(
                jnp.broadcast_to(t_ref[0, 2 * r + 1:2 * r + 2, :], s.shape),
                i7, axis=1)
            v = jnp.where(s < 128, lo, hi)
            acc = v if acc is None else acc ^ v
        o_ref[0] = acc
    run_variant("gather256_u8_x3", k3b, (tspec8,), (table8,))

    # v4: int16 gather (code in i16; 16x128 vregs)
    def k4(s_ref, t_ref, o_ref):
        s = s_ref[0].astype(jnp.int16)
        i7 = s & jnp.int16(127)
        lo = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 0:1, :], s.shape), i7, axis=1)
        hi = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 1:2, :], s.shape), i7, axis=1)
        w = jnp.where(s < 128, lo, hi)
        o_ref[0] = (w & 0xFF).astype(jnp.uint8)
    run_variant("gather256_i16", k4, (tspec16,), (table16,))

    # v5: gather with operand pre-broadcast once per block (i32)
    def k5(s_ref, t_ref, o_ref):
        s = s_ref[0].astype(jnp.int32)
        i7 = s & 127
        T0 = jnp.broadcast_to(t_ref[0, 0:1, :], (C, LANES))
        T1 = jnp.broadcast_to(t_ref[0, 1:2, :], (C, LANES))
        lo = jnp.take_along_axis(T0, i7, axis=1)
        hi = jnp.take_along_axis(T1, i7, axis=1)
        w = jnp.where(s < 128, lo, hi)
        o_ref[0] = (w & 0xFF).astype(jnp.uint8)
    run_variant("gather256_i32_prebroadcast", k5, (tspec32,), (table32,))

    # v6: 8-row loop, [8,128]-shaped gathers (vreg-at-a-time, i32)
    def k6(s_ref, t_ref, o_ref):
        t0 = jnp.broadcast_to(t_ref[0, 0:1, :], (8, LANES))
        t1 = jnp.broadcast_to(t_ref[0, 1:2, :], (8, LANES))
        for g in range(C // 8):
            s = s_ref[0, g * 8:(g + 1) * 8, :].astype(jnp.int32)
            i7 = s & 127
            lo = jnp.take_along_axis(t0, i7, axis=1)
            hi = jnp.take_along_axis(t1, i7, axis=1)
            w = jnp.where(s < 128, lo, hi)
            o_ref[0, g * 8:(g + 1) * 8, :] = (w & 0xFF).astype(jnp.uint8)
    run_variant("gather256_i32_vreg_loop", k6, (tspec32,), (table32,))

    # v7: full encode stage-1 equivalent (gather + unpack + mask)
    def k7(s_ref, t_ref, o_ref):
        s = s_ref[0].astype(jnp.int32)
        i7 = s & 127
        lo = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 0:1, :], s.shape), i7, axis=1)
        hi = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[0, 1:2, :], s.shape), i7, axis=1)
        p = jnp.where(s < 128, lo, hi)
        l = jax.lax.shift_right_logical(p, 15)
        w = p & 0x7FFF
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 0)
        cc = jnp.clip(65536 - lane * C, 0, C)
        valid = pos < cc
        w = jnp.where(valid, w, 0)
        l = jnp.where(valid, l, 0)
        o_ref[0] = ((w ^ l) & 0xFF).astype(jnp.uint8)
    run_variant("stage1_like", k7, (tspec32,), (table32,))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
