"""Per-block byte histograms.

Reference analogue: the serial one-pass ``histogram``
(n_ary_huffman.c:461-493).  On device the whole [B, S] batch is
histogrammed at once with a flattened scatter-add (block b, byte v) ->
bin b*256+v; padding positions are dropped via an out-of-range index.
A Pallas VMEM-accumulating kernel can replace this; the XLA scatter-add
is already memory-bound-ish and fully parallel across blocks.

Unlike the reference (which asserts no NUL bytes and warns above 126,
:482-487), all 256 byte values are first-class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def block_histograms(blocks: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, S] uint8 + [B] valid lengths -> [B, 256] int32 counts."""
    B, S = blocks.shape
    pos = jnp.arange(S)[None, :]
    valid = pos < lengths[:, None]
    flat_bins = jnp.arange(B, dtype=jnp.int32)[:, None] * 256 + blocks.astype(jnp.int32)
    flat_bins = jnp.where(valid, flat_bins, B * 256)  # dropped
    hist = jnp.zeros((B * 256 + 1,), jnp.int32).at[flat_bins.reshape(-1)].add(
        1, mode="drop"
    )
    return hist[: B * 256].reshape(B, 256)


def global_histogram(blocks: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, S] -> [256] stream-level histogram (shared-table mode).  In
    the sharded pipeline this is psum-reduced across devices
    (parallel/pipeline.py)."""
    return block_histograms(blocks, lengths).sum(axis=0)
