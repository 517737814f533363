"""Persistent-JIT-cache opt-in.

The fused Pallas codecs cost minutes to compile on a real chip; the
persistent compilation cache makes every process after the first start
in milliseconds.  This is enabled LAZILY, the first time a Pallas
kernel module is imported — never on bare ``import data_compression_tpu``
— so merely importing the library leaves user-level jax configuration
and process environment untouched.  Opt out by exporting
``JAX_COMPILATION_CACHE_DIR=""`` (empty); an explicit non-empty user
setting is honored as-is.
"""

from __future__ import annotations

import os

_done = False


def enable_persistent_cache() -> None:
    """Point jax's persistent compilation cache at a per-user dir.

    Idempotent, best-effort; respects an explicit user setting of
    JAX_COMPILATION_CACHE_DIR (including the empty string as opt-out).
    """
    global _done
    if _done:
        return
    _done = True
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env == "":
        return  # explicit opt-out
    cache_dir = env or os.path.join(
        os.path.expanduser("~"), ".cache", "data_compression_tpu", "jit"
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
