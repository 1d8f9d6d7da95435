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

import functools

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SortedBinning(NamedTuple):
    """Chunk-aligned ("paged") sorted pair layout for the Pallas compositor.

    Every tile's pair list is padded to a multiple of the compositor chunk so
    the kernel's HBM DMA windows are tile-aligned (a Mosaic requirement for
    dynamic memref slices) and each tile owns its padding — backward writes
    never touch another tile's slots.
    """

    paged_src: jnp.ndarray  # (P_pad,) int32: slot -> original flat pair idx
    #                         (or the appended zero row for padding slots)
    inv_paged: jnp.ndarray  # (P,) int32: original flat pair idx -> slot
    #                         (or P_pad for culled/sentinel pairs)
    starts: jnp.ndarray  # (num_tiles,) int32, chunk-aligned
    counts: jnp.ndarray  # (num_tiles,) int32 true counts (capped)
    overflow_pairs: jnp.ndarray  # () int32 dropped by per-gaussian budget
    overflow_tiles: jnp.ndarray  # () int32 beyond the per-tile processing cap
    overflow_capacity: jnp.ndarray = None  # () int32 dropped by pair_capacity
    pairs_demand: jnp.ndarray = None  # () int32 chunk-padded slots the view
    #                                   actually needs (pre-capacity): the
    #                                   capacity controller's jump target


def _tile_min_power(xy, conic, tx, ty, tile_size):
    """Exact minimum of the Gaussian exponent q = 0.5·a·dx² + b·dx·dy +
    0.5·c·dy² over each candidate tile's pixel box (±0.5px slack).

    q is convex (the conic is PD for valid Gaussians), so the box minimum is
    0 when the center lies inside, else the best of the four edge minima
    (each a clamped 1D quadratic). Anisotropy-aware: for the elongated
    footprints of hair segments this drops the off-axis tiles of the 3σ
    square that a euclidean disk test cannot."""
    a = conic[:, 0:1]
    b = conic[:, 1:2]
    c = conic[:, 2:3]
    a_s = jnp.maximum(a, 1e-12)
    c_s = jnp.maximum(c, 1e-12)
    lx = (tx * tile_size).astype(jnp.float32) - 0.5 - xy[:, 0:1]
    hx = lx + tile_size
    ly = (ty * tile_size).astype(jnp.float32) - 0.5 - xy[:, 1:2]
    hy = ly + tile_size

    def q(dx, dy):
        return 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy

    def edge_x(dx_e):  # fixed dx, optimize dy
        dy = jnp.clip(-b * dx_e / c_s, ly, hy)
        return q(dx_e, dy)

    def edge_y(dy_e):  # fixed dy, optimize dx
        dx = jnp.clip(-b * dy_e / a_s, lx, hx)
        return q(dx, dy_e)

    inside = (lx <= 0.0) & (hx >= 0.0) & (ly <= 0.0) & (hy >= 0.0)
    q_edges = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(hx)),
        jnp.minimum(edge_y(ly), edge_y(hy)),
    )
    return jnp.where(inside, 0.0, q_edges)


PROBE_MULT = 4  # rect cells tested per budget slot (see _expand_pairs)


def _expand_pairs(rect, valid, grid_w, grid_h, max_tiles_per_gaussian,
                  xy=None, conic=None, q_cut=None, tile_size=16):
    """Enumerate each Gaussian's candidate (tile, slot) pairs.

    With xy + conic + q_cut given, tiles where the Gaussian's exponent
    cannot reach alpha >= 1/255 (min-over-box q > q_cut = ln(255·opa)) are
    dropped. Exact: every pixel of a dropped tile fails the compositor's
    ALPHA_MIN gate, so the render and all gradients are unchanged while
    pair lists and overflow shrink.

    The per-gaussian budget applies POST-cull: a probe window of
    PROBE_MULT*r_max rect cells is tested and the first r_max PASSING cells
    are kept (deterministic top-k on a rank-encoding score). For the thin
    elongated footprints of hair segments most of the 3σ rect fails the cull,
    so budgeting pre-cull cells (as the CUDA rect loop would,
    rasterizer_impl.cu:70-111 duplicates every rect cell) wasted most of the
    budget on cells that render nothing. overflow_pairs counts only truly
    lost work: passing cells beyond the budget plus untested cells beyond
    the probe window."""
    n = rect.shape[0]
    r_max = max_tiles_per_gaussian
    num_tiles = grid_w * grid_h
    rw = rect[:, 2] - rect[:, 0]
    rh = rect[:, 3] - rect[:, 1]
    count = rw * rh
    rw_safe = jnp.maximum(rw, 1)
    use_cull = xy is not None and conic is not None and q_cut is not None
    r_probe = r_max * PROBE_MULT if use_cull else r_max
    r = jnp.arange(r_probe, dtype=jnp.int32)
    tx = rect[:, 0:1] + (r[None, :] % rw_safe[:, None])
    ty = rect[:, 1:2] + (r[None, :] // rw_safe[:, None])
    pair_ok = valid[:, None] & (r[None, :] < count[:, None])
    if use_cull:
        q_min = _tile_min_power(xy, conic, tx, ty, tile_size)
        pair_ok = pair_ok & (q_min <= q_cut[:, None] + 1e-4)
    tile_probe = jnp.where(pair_ok, ty * grid_w + tx, num_tiles)
    if r_probe > r_max:
        # first r_max passing cells: score passing cells above failing ones,
        # each tier in increasing-cell order (distinct scores — top_k tie
        # handling never enters)
        score = jnp.where(pair_ok, r_probe - r, -1 - r)
        _, sel = jax.lax.top_k(score, r_max)
        tile = jnp.take_along_axis(tile_probe, sel, axis=1)
        n_passing = jnp.sum(pair_ok, axis=1)
        # Untested rect cells beyond the probe window are counted at the
        # probe window's observed alpha-cull pass rate, not 1:1 — for the
        # large-footprint gaussians that exceed the window most untested
        # cells would fail the cull, and counting them all as lost inflates
        # overflow_pairs into the adaptive tile-budget controller (each
        # unnecessary budget growth costs a multi-minute recompile).
        n_tested = jnp.maximum(jnp.minimum(count, r_probe), 1)
        pass_rate = n_passing.astype(jnp.float32) / n_tested.astype(jnp.float32)
        est_untested = jnp.round(
            jnp.maximum(count - r_probe, 0).astype(jnp.float32) * pass_rate
        ).astype(n_passing.dtype)
        lost = jnp.maximum(n_passing - r_max, 0) + est_untested
    else:
        tile = tile_probe
        lost = jnp.maximum(count - r_max, 0)
    overflow_pairs = jnp.sum(jnp.where(valid, lost, 0))
    return tile, overflow_pairs


def paged_capacity(n: int, max_tiles_per_gaussian: int, num_tiles: int,
                   chunk: int) -> int:
    """Static upper bound for the paged layout: every pair plus < chunk of
    per-tile padding, plus one spare chunk of always-zero slots (the target
    for culled pairs' backward gather)."""
    return n * max_tiles_per_gaussian + (num_tiles + 1) * chunk


def compact_capacity(pair_capacity: int, n: int, max_tiles_per_gaussian: int,
                     num_tiles: int, chunk: int) -> int:
    """Effective paged-table size for a requested pair budget.

    The worst-case bound (paged_capacity) sizes the table for every gaussian
    using its full tile budget — at hair scale that is 6-9x the post-cull
    real pair count, and every downstream buffer (two gathered pair planes,
    two gradient planes, their zero-inits) pays the padding in HBM traffic
    (round-3 roofline: the step is padding/overhead-bound). A pair_capacity
    sizes the table near the true demand; tiles whose chunk-aligned page
    would start past the cap are truncated and counted in overflow_tiles so
    the driver's budget controller can grow the bucket.
    pair_capacity is rounded up to the chunk and includes the trailing spare
    zero chunk."""
    cap = min(int(pair_capacity),
              paged_capacity(n, max_tiles_per_gaussian, num_tiles, chunk))
    return max(((cap + chunk - 1) // chunk) * chunk, 2 * chunk)


def _page_tiles(counts, chunk, p_pad, pair_capacity):
    """Chunk-aligned paging + optional capacity truncation, shared by both
    sort modes. counts must already be capped at max_pairs_per_tile."""
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    padded_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_counts)[:-1].astype(jnp.int32)]
    )
    pairs_demand = (padded_starts[-1] + padded_counts[-1] + chunk).astype(
        jnp.int32)
    overflow_capacity = jnp.zeros((), jnp.int32)
    if pair_capacity > 0:
        # compact mode: the last chunk is the reserved always-zero target of
        # culled pairs' backward gather; tiles whose page spills past it are
        # truncated (allowed is a chunk multiple because content_cap and
        # every padded start are), and the drops are surfaced through
        # overflow_capacity so the driver's capacity controller can jump
        # straight to pairs_demand.
        content_cap = p_pad - chunk
        allowed = jnp.maximum(content_cap - padded_starts, 0)
        new_counts = jnp.minimum(counts, allowed)
        overflow_capacity = jnp.sum(counts - new_counts)
        counts = new_counts
        padded_starts = jnp.minimum(padded_starts, content_cap)
    return counts, padded_starts, overflow_capacity, pairs_demand


def _quantize_depth(depth, num_tiles):
    """The framework's canonical compositing-order key: ~20-bit quantized
    view depth (the CUDA [tile|float-depth-bits] key, rasterizer_impl.cu:
    70-111, uses 32 depth bits in a 64-bit key; an int32 fused key at 1000^2
    leaves ~19 — a documented deviation). BOTH binning paths must sort this
    same key: depth near-ties fall back to stable gaussian-index order, and
    compositing is order-dependent at the ties — the round-4/5 on-TPU
    parity-gate "FAIL" (2.78e-3 image err) was exactly the pallas path
    (quantized key) and the XLA oracle (then exact-float key) ordering 17
    tiles' ties differently: f64 host compositing of the two legal orders
    reproduces 2.61e-3 (scripts/order_effect_probe.py), while every per-op
    suspect measured clean on hardware (dots at HIGHEST 9.1e-8 rel-vs-f64,
    cumsum 5.8e-7, exp/log1p bit-identical pallas-vs-XLA;
    scripts/mosaic_precision_probe.py, scripts/cumsum_precision_probe.py).
    """
    depth_bits = max(1, min(23, int(np.floor(np.log2(2**31 / (num_tiles + 1))))))
    levels = (1 << depth_bits) - 1
    d = jax.lax.stop_gradient(depth)
    dq = (jnp.clip(d / (d + 1.0), 0.0, 1.0) * levels).astype(jnp.int32)
    return dq, levels


def bin_gaussians_sorted(
    rect: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    grid_w: int,
    grid_h: int,
    max_tiles_per_gaussian: int,
    max_pairs_per_tile: int,
    chunk: int,
    xy=None,
    conic=None,
    q_cut=None,
    tile_size: int = 16,
    pair_capacity: int = 0,
) -> SortedBinning:
    """Sort-based binning emitting a chunk-aligned paged layout + ranges
    (for the Pallas path — no (num_tiles, K) materialization).

    Both directions of the pair<->slot mapping are materialized so the
    backward pass *gathers* per-pair gradients back to original order instead
    of scatter-adding — scatters are an order of magnitude slower than
    gathers on TPU.

    pair_capacity > 0 compacts the paged table to that many slots (see
    compact_capacity); pairs of tiles that no longer fit are dropped
    highest-tile-index-first and counted in overflow_capacity, with the true
    (uncapped) padded demand reported in pairs_demand so a driver can size
    the next bucket in one jump.

    Ordering: one stable lexicographic lax.sort over the fused
    [tile|quantized-depth] int32 key of ALL P pair slots. A blockwise
    two-level "bucket" variant (TPU analogue of CUB's radix sort,
    rasterizer_impl.cu:277-308) was built and DELETED in round 5: it
    measured 4x SLOWER on hardware (2.81 vs 10.19 it/s solo,
    _runs/perf_r4/bench_compact_bucket.json) and the monolithic sort is
    only ~1.5 ms of a ~60 ms step — no headroom worth the trap.
    """
    n = rect.shape[0]
    r_max = max_tiles_per_gaussian
    num_tiles = grid_w * grid_h
    p = n * r_max
    if pair_capacity > 0:
        p_pad = compact_capacity(pair_capacity, n, r_max, num_tiles, chunk)
    else:
        p_pad = paged_capacity(n, r_max, num_tiles, chunk)

    dq, levels = _quantize_depth(depth, num_tiles)

    tile, overflow_pairs = _expand_pairs(
        rect, valid, grid_w, grid_h, r_max,
        xy=xy, conic=conic, q_cut=q_cut, tile_size=tile_size,
    )

    flat_idx = jnp.arange(p, dtype=jnp.int32)

    # fused single int32 sort key: tile in the high bits, quantized depth in
    # the low bits. One sorted operand instead of two keys ~halves sort
    # traffic.
    key = tile * (levels + 1) + dq[:, None]
    sorted_key, perm = jax.lax.sort(
        (key.reshape(-1), flat_idx), num_keys=1, is_stable=True
    )
    sorted_tile = sorted_key // (levels + 1)

    tile_ids = jnp.arange(num_tiles, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts
    overflow_tiles = jnp.sum(jnp.maximum(counts - max_pairs_per_tile, 0))
    counts = jnp.minimum(counts, max_pairs_per_tile)

    counts, padded_starts, overflow_capacity, pairs_demand = _page_tiles(
        counts, chunk, p_pad, pair_capacity)

    # Per-sorted-position tile tables via segment-delta cumsums — O(P)
    # vectorized, no P-sized gathers or binary searches (those dominate the
    # step time on TPU otherwise). For every sorted position sp in tile t we
    # need starts[t], counts[t] and the pad offset ps[t]-starts[t]; each is a
    # per-segment constant, so scatter its per-tile delta at the segment
    # start and integrate with a cumsum (co-located starts of empty tiles
    # accumulate correctly through scatter-add).
    def segment_table(values):
        deltas = jnp.concatenate([values[:1], values[1:] - values[:-1]])
        buf = jnp.zeros(p, values.dtype).at[starts].add(deltas, mode="drop")
        return jnp.cumsum(buf)

    sp = flat_idx
    starts_at = segment_table(starts)
    counts_at = segment_table(counts)
    pad_at = segment_table(padded_starts - starts)
    offset_in_tile = sp - starts_at
    valid_sorted = (sorted_tile < num_tiles) & (offset_in_tile < counts_at)
    dest = sp + pad_at

    # two small int32 scatters build both directions of the mapping
    paged_src = jnp.full(p_pad, p, jnp.int32).at[
        jnp.where(valid_sorted, dest, p_pad)
    ].set(perm, mode="drop")
    # culled pairs target the final spare chunk (always zero in the grads)
    inv_paged = jnp.zeros(p, jnp.int32).at[perm].set(
        jnp.where(valid_sorted, dest, p_pad - chunk).astype(jnp.int32)
    )

    return SortedBinning(
        paged_src=paged_src,
        inv_paged=inv_paged,
        starts=padded_starts,
        counts=counts,
        overflow_pairs=overflow_pairs,
        overflow_tiles=overflow_tiles,
        overflow_capacity=overflow_capacity,
        pairs_demand=pairs_demand,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_pairs(packed, paged_src, inv_paged, r_max):
    """Paged pair table directly from the per-gaussian packed table.

    packed: (N+1, PACK) with a trailing zero row; paged_src indexes the
    *virtual* (N*r_max)-pair expansion, so the source gaussian is simply
    paged_src // r_max (the zero row N falls out of N*r_max // r_max). The
    VJP gathers slot gradients back per pair (inv_paged) and reduces over
    each gaussian's r_max slots — no scatters, no 100MB pair-table
    materialization in the forward."""
    return packed[paged_src // r_max]


def _gather_pairs_fwd(packed, paged_src, inv_paged, r_max):
    return packed[paged_src // r_max], (inv_paged, packed.shape[0])


def _gather_pairs_bwd(r_max, res, g):
    inv_paged, n_plus_1 = res
    n = n_plus_1 - 1
    per_pair = g[inv_paged]  # (N*r_max, PACK); culled pairs hit zero slots
    # accumulate the r_max slots in f32 even for bf16 feature planes (the
    # per-pair grads are already rounded; don't compound it in the reduce)
    per_gauss = per_pair.reshape(n, r_max, -1).astype(jnp.float32).sum(axis=1)
    per_gauss = per_gauss.astype(g.dtype)
    d_packed = jnp.concatenate(
        [per_gauss, jnp.zeros((1, per_gauss.shape[1]), per_gauss.dtype)], axis=0
    )
    return d_packed, None, None


gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


@jax.custom_vjp
def permute_rows(rows, fwd_idx, bwd_idx):
    """rows[fwd_idx] with a gather-based VJP (g[bwd_idx]) — avoids the slow
    TPU scatter in the transpose of a gather.

    Contract: fwd_idx/bwd_idx are mutually inverse over the "real" entries;
    padding entries on either side must point at zero rows/slots. The
    cotangent of `rows` gets a zero final row appended (the zero-row target
    of padding slots accumulates nothing)."""
    return rows[fwd_idx]


def _permute_fwd(rows, fwd_idx, bwd_idx):
    return rows[fwd_idx], (bwd_idx, rows.shape[0])


def _permute_bwd(res, g):
    bwd_idx, n_rows = res
    back = g[bwd_idx]
    pad = n_rows - back.shape[0]
    if pad > 0:
        back = jnp.concatenate(
            [back, jnp.zeros((pad,) + back.shape[1:], back.dtype)], axis=0
        )
    return back, None, None


permute_rows.defvjp(_permute_fwd, _permute_bwd)


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
    xy=None,
    conic=None,
    q_cut=None,
    tile_size: int = 16,
) -> Binning:
    n = rect.shape[0]
    r_max = max_tiles_per_gaussian
    num_tiles = grid_w * grid_h

    tile, overflow_pairs = _expand_pairs(
        rect, valid, grid_w, grid_h, r_max,
        xy=xy, conic=conic, q_cut=q_cut, tile_size=tile_size,
    )

    # SAME quantized key as bin_gaussians_sorted (see _quantize_depth): the
    # two paths must order depth ties identically or pallas-vs-XLA parity
    # breaks at alpha^2 scale wherever ties overlap (~2.6e-3 measured).
    dq, _ = _quantize_depth(depth, num_tiles)
    depth_rep = jnp.broadcast_to(dq[:, None], (n, r_max))
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
