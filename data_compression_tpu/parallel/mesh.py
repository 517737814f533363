"""Device mesh construction.

The parallelism model (SURVEY.md §2.5, §5): independent fixed-size
blocks are the sharding axis — the codec equivalent of data parallelism
— and within a block, byte-aligned chunks are a second shardable axis
(the sequence-parallel analogue).  The mesh is therefore at most 2-D:

  axis "data":  blocks    (DP — primary)
  axis "chunk": chunks    (SP-like — used when blocks per device < 1
                           or to spread one huge block)

The reference is single-threaded C (nothing to cite); this layer is
what BASELINE.json's north star prescribes: pjit-sharded [blocks, ...]
with tables broadcast and compressed lengths allgathered.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D or 2-D mesh over available devices, axes ("data", "chunk")."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != {n} devices"
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, ("data", "chunk"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Blocks [B, S]: B over 'data'."""
    return NamedSharding(mesh, P("data", None))


def chunk_sharding(mesh: Mesh) -> NamedSharding:
    """Flat chunks [N, C]: N over both axes (dp x sp)."""
    return NamedSharding(mesh, P(("data", "chunk"), None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
