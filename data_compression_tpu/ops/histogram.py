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
    """[B, S] uint8 + [B] valid lengths -> [B, 256] int32 counts.

    Formulated as a one-hot matmul so the MXU does the counting
    (TPU scatter-add serializes; compare+dot streams).  The sum of a
    [S] one-hot slab in f32 is exact for S < 2^24.
    """
    B, S = blocks.shape
    pos = jnp.arange(S)[None, :]
    valid = pos < lengths[:, None]
    b = jnp.where(valid, blocks.astype(jnp.int32), -1)
    onehot = (b[:, :, None] == jnp.arange(256, dtype=jnp.int32)[None, None, :]).astype(
        jnp.bfloat16
    )
    ones = jnp.ones((1, S), jnp.bfloat16)
    # [B, 1, S] @ [B, S, 256] -> [B, 1, 256]
    h = jax.lax.dot_general(
        jnp.broadcast_to(ones, (B, 1, S)),
        onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return h[:, 0, :].astype(jnp.int32)


def global_histogram(blocks: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, S] -> [256] stream-level histogram (shared-table mode).  In
    the sharded pipeline this is psum-reduced across devices
    (parallel/pipeline.py)."""
    return block_histograms(blocks, lengths).sum(axis=0)
