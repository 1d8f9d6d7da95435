"""Batched device->host pulls that never ship arena padding.

The device->host link through the remote TPU runtime measures ~1 MB/s
(CLAUDE.md), and the model arenas are capacity-padded — at 500k+ segments the
pad rows alone can double a topology event's pull. These helpers slice on
device before transferring, with the slice length rounded UP to a granule so
the eager slice op compiles once per bucket instead of once per event (every
new shape is a fresh executable on the remote compile helper).
"""

import numpy as np

GRANULE = 16384


def sliced_pull(sources) -> dict:
    """sources: {key: (device_array, n_rows)} -> {key: np.ndarray[:n_rows]}.

    One batched jax.device_get (single round trip); each array is sliced on
    device to n_rows rounded up to GRANULE (capped at capacity), then trimmed
    host-side."""
    import jax

    cut = {}
    for k, (arr, n) in sources.items():
        cap = arr.shape[0]
        stop = min(cap, -(-n // GRANULE) * GRANULE)
        cut[k] = jax.lax.slice_in_dim(arr, 0, stop) if stop < cap else arr
    pulled = jax.device_get(cut)
    # np.array: device_get hands back read-only buffers, and callers
    # (topology host mirrors) mutate these in place
    return {
        k: np.array(pulled[k][: sources[k][1]]) for k in sources
    }
