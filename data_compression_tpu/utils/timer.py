"""Throughput timing helpers (the reference's only perf tool is GNU
``time --verbose`` wrappers in its Makefile:30-42; here we time device
compute directly and report GB/s)."""

from __future__ import annotations

import time
from typing import Callable

import jax


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def measure_gbps(fn: Callable, nbytes: int, iters: int = 5, warmup: int = 2) -> dict:
    """Time ``fn()`` (which must return JAX arrays or pytrees thereof)
    and report throughput over ``nbytes`` of input per call."""
    for _ in range(warmup):
        out = fn()
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    avg = sum(times) / len(times)
    return {
        "best_s": best,
        "avg_s": avg,
        "gbps_best": nbytes / best / 1e9,
        "gbps_avg": nbytes / avg / 1e9,
        "nbytes": nbytes,
    }


def measure_gbps_chained(step: Callable, x0, nbytes: int,
                         iters: int = 12, trials: int = 3) -> dict:
    """Steady-state throughput over a DEPENDENT CHAIN x -> step(x):
    dispatches pipeline, so per-dispatch host/relay latency amortizes
    away (the methodology bench.py uses; see its module docstring)."""
    x = step(x0)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(trials):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"best_s": best, "gbps_best": nbytes / best / 1e9, "nbytes": nbytes}


def profile_trace(logdir: str):
    """jax.profiler trace context: device timelines for the fused
    kernels land in ``logdir`` (view with tensorboard/xprof).  The
    reference's only profiling tool is GNU time (Makefile:30-42); this
    is its TPU-native replacement."""
    import jax.profiler

    return jax.profiler.trace(logdir)
