"""Batched device->host pulls that never ship arena padding.

The device->host link through the remote TPU runtime measures ~1 MB/s
(CLAUDE.md), and the model arenas are capacity-padded — at 500k+ segments the
pad rows alone can double a topology event's pull. These helpers slice on
device before transferring, with the slice length rounded UP to a granule so
the eager slice op compiles once per bucket instead of once per event (every
new shape is a fresh executable on the remote compile helper).

The pull is split in two so the async topology worker can snapshot cheaply:
`sliced_cut` runs the device-side slices (its outputs are NEW buffers, so a
later train step donating the source arenas cannot invalidate them) and
`finish_pull` does the actual transfer — callable from a worker thread.
"""

import numpy as np

GRANULE = 16384


def sliced_cut(sources) -> dict:
    """Device-side half of a pull: {key: (device_array, n_rows)} ->
    {key: (sliced_device_array, n_rows)}.

    Each array is sliced to n_rows rounded up to GRANULE. The slice always
    runs, even at full capacity: its output is a fresh buffer, making the
    snapshot immune to buffer donation by subsequently dispatched steps."""
    import jax

    cut = {}
    for k, (arr, n) in sources.items():
        cap = arr.shape[0]
        stop = min(cap, -(-n // GRANULE) * GRANULE)
        cut[k] = (jax.lax.slice_in_dim(arr, 0, stop), n)
    return cut


def finish_pull(cut) -> dict:
    """Transfer half of a pull: one batched jax.device_get (single round
    trip), then trim the granule padding host-side."""
    import jax

    pulled = jax.device_get({k: arr for k, (arr, _) in cut.items()})
    # np.array: device_get hands back read-only buffers, and callers
    # (topology host mirrors) mutate these in place
    return {k: np.array(pulled[k][: cut[k][1]]) for k in cut}


def sliced_pull(sources) -> dict:
    """sources: {key: (device_array, n_rows)} -> {key: np.ndarray[:n_rows]}."""
    return finish_pull(sliced_cut(sources))
