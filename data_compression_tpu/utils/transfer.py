"""Relay-aware host<->device transfer helpers.

This container reaches its TPU through a loopback relay whose transfer
behavior is pathological for naive array movement (measured 2026-08-20,
see docs/E2E.md):

  * 2-D host->device puts appear to ship row-by-row: a [1024, 65536]
    uint8 upload took 10.2 s where the same bytes as a 1-D array took
    0.10 s (~670 MB/s, repeats ~1.5 GB/s via content caching).
  * Monolithic device->host fetches degrade super-linearly: one 64 MiB
    device_get took 131 s (0.5 MB/s), while the same buffer fetched as
    16 async 4 MiB slices took 2.3 s (~28 MB/s — the link's apparent
    d2h ceiling).

Hence the two rules encoded here: always move 1-D buffers (reshape on
the device, where it is free/cheap), and fetch large buffers as
pipelined medium slices.  On a normally-attached (PCIe) TPU host these
helpers degrade gracefully to plain transfers.
"""

from __future__ import annotations

import numpy as np

# d2h slice granularity: large enough to amortize the ~43 ms dispatch
# round trip, small enough to dodge the big-message pathology.
D2H_SLICE_BYTES = 4 * 1024 * 1024
_MONO_LIMIT = 8 * 1024 * 1024  # below this a single fetch is fine


def to_device(arr: np.ndarray):
    """Host array -> device, shipped flat (relay rule 1)."""
    import jax

    a = np.ascontiguousarray(arr)
    d = jax.device_put(a.reshape(-1))
    return d.reshape(a.shape)


def from_device(d) -> np.ndarray:
    """Device array -> host ndarray via pipelined 1-D slice fetches
    (relay rule 2)."""
    shape = tuple(d.shape)
    flat = d.reshape(-1)
    n = flat.shape[0]
    itemsize = np.dtype(flat.dtype).itemsize
    if n * itemsize <= _MONO_LIMIT:
        return np.asarray(flat).reshape(shape)
    k = max(1, D2H_SLICE_BYTES // itemsize)
    parts = [flat[i : i + k] for i in range(0, n, k)]
    for p in parts:
        p.copy_to_host_async()
    out = np.empty(n, np.dtype(flat.dtype))
    o = 0
    for p in parts:
        x = np.asarray(p)
        out[o : o + x.size] = x
        o += x.size
    return out.reshape(shape)
