"""Sort-based (Gaussian, tile) pair binning with fixed shapes.

TPU-native replacement for the CUDA pipeline in rasterizer_impl.cu:198-336
(InclusiveSum -> duplicateWithKeys -> RadixSort -> identifyTileRanges):

- instead of a dynamically-sized duplicated key buffer, every Gaussian gets a
  fixed budget of `max_tiles_per_gaussian` (tile, depth) slots; unused slots
  carry a sentinel tile id that sorts last;
- a single stable lexicographic `lax.sort` over (tile, depth) replaces the
  CUB radix sort;
- per-tile ranges come from `searchsorted` on the sorted tile ids (replacing
  identifyTileRanges, rasterizer_impl.cu:116-138);
- per-tile lists are truncated to `max_pairs_per_tile` *nearest-depth* entries
  (overflow is counted and reported so callers can grow the capacity).

Everything is fixed-shape so the whole render step jit-compiles once.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gather_idx: jnp.ndarray  # (num_tiles, K) int32 indices into the Gaussian axis
    pair_valid: jnp.ndarray  # (num_tiles, K) bool
    tile_counts: jnp.ndarray  # (num_tiles,) int32 true pair counts (pre-truncation)
    overflow_pairs: jnp.ndarray  # () int32 pairs dropped by per-gaussian budget
    overflow_tiles: jnp.ndarray  # () int32 pairs dropped by per-tile capacity


def bin_gaussians(
    rect: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    grid_w: int,
    grid_h: int,
    max_tiles_per_gaussian: int,
    max_pairs_per_tile: int,
) -> Binning:
    n = rect.shape[0]
    r_max = max_tiles_per_gaussian
    num_tiles = grid_w * grid_h

    rw = rect[:, 2] - rect[:, 0]
    rh = rect[:, 3] - rect[:, 1]
    count = rw * rh
    rw_safe = jnp.maximum(rw, 1)

    r = jnp.arange(r_max, dtype=jnp.int32)
    tx = rect[:, 0:1] + (r[None, :] % rw_safe[:, None])
    ty = rect[:, 1:2] + (r[None, :] // rw_safe[:, None])
    pair_ok = valid[:, None] & (r[None, :] < count[:, None])
    tile = jnp.where(pair_ok, ty * grid_w + tx, num_tiles)  # sentinel sorts last

    overflow_pairs = jnp.sum(jnp.where(valid, jnp.maximum(count - r_max, 0), 0))

    depth_rep = jnp.broadcast_to(jax.lax.stop_gradient(depth)[:, None], (n, r_max))
    gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, r_max))

    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile.reshape(-1), depth_rep.reshape(-1), gid.reshape(-1)),
        num_keys=2,
        is_stable=True,
    )

    tile_ids = jnp.arange(num_tiles, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    k = jnp.arange(max_pairs_per_tile, dtype=jnp.int32)
    idx = starts[:, None] + k[None, :]
    pair_valid = k[None, :] < jnp.minimum(counts, max_pairs_per_tile)[:, None]
    idx = jnp.clip(idx, 0, n * r_max - 1)
    gather_idx = sorted_gid[idx]

    overflow_tiles = jnp.sum(jnp.maximum(counts - max_pairs_per_tile, 0))

    return Binning(
        gather_idx=gather_idx,
        pair_valid=pair_valid,
        tile_counts=counts,
        overflow_pairs=overflow_pairs,
        overflow_tiles=overflow_tiles,
    )
