"""Top-level differentiable render entry point.

Replaces the reference render() front-end (gaussian_renderer/__init__.py:24-127)
plus the CUDA Rasterizer::forward pipeline (rasterizer_impl.cu:198-336).

Key TPU-first departure from the reference: the renderer is *channel-generic*
(the CUDA kernel is hard-wired to 3 channels, config.h:15), so one fused pass
renders rgb + hair-mask + orientation together instead of the reference's
three rasterizations per training step (train.py:146, loss/losses.py:247,312).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hairgs_tpu.core.camera import Camera
from hairgs_tpu.core.sh import eval_sh
from hairgs_tpu.render.binning import bin_gaussians
from hairgs_tpu.render.composite import assemble_image, composite
from hairgs_tpu.render.preprocess import preprocess


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (shapes are fixed under jit).

    tile_size 16 matches config.h:15-16 (BLOCK_X/Y). The two capacities
    replace the dynamically-resized CUDA arenas (rasterize_points.cu:27-33);
    overflow is counted and surfaced so drivers can bump the bucket.

    use_pallas selects the Pallas tile kernels (per-tile work proportional to
    actual list length, transmittance early-exit) over the XLA scan
    compositor; on non-TPU backends the kernels run in interpreter mode,
    which is only suitable for tests.
    """

    tile_size: int = 16
    max_tiles_per_gaussian: int = 16
    max_pairs_per_tile: int = 1024
    chunk: int = 32
    use_pallas: bool = False
    # bf16 feature plane (geometry stays f32): halves the feature half of
    # the pair-table traffic in gather + both kernel passes; feature values
    # and their per-pair gradients round to bf16 (accumulation stays f32)
    feat_bf16: bool = False
    # tiles handled per pallas grid step (amortizes per-step overhead)
    tiles_per_step: int = 32
    # Mip-Splatting-style dilation compensation: scale opacity by
    # sqrt(det(cov)/det(cov+0.3I)) so the +0.3px low-pass stops inflating
    # each Gaussian's screen-space energy (opt-in improvement; the reference
    # composites the dilated covariance uncompensated, forward.cu:110)
    antialiasing: bool = False
    # compact paged pair table: > 0 sizes the table to this many slots
    # instead of the n*max_tiles_per_gaussian worst case (6-9x the real
    # post-cull pair count at hair scale — the round-3 roofline's padding
    # tax). Tiles that no longer fit are truncated into overflow_tiles, so
    # drivers must grow the bucket on overflow like the tile budget.
    # 0 = worst-case sizing (always overflow-free w.r.t. capacity).
    pair_capacity: int = 0
    # emit the photometric-only viewspace gradients (densification stats)
    # into the aux rows of the pallas backward. The stats cost one extra
    # fdotg/suffix matmul pair per chunk in the step's largest phase; turn
    # them off once densification stops (the reference stops at 0.9*iters,
    # arguments/__init__.py:103) — drivers rebuild the step at the boundary.
    viewspace_stats: bool = True
    # cross-tile DMA lookahead in the pallas compositor: issue the next
    # tile's input copies on an alternate slot bank before this tile's
    # compute, hiding the DMA-latency bubble at every tile switch (tiles
    # average 1-2 chunks at bench scale, so the bubble dominates). Costs one
    # extra geo+feat slot-array of VMEM in both kernels. Bit-identical.
    dma_lookahead: bool = False
    # per-pair alpha gate (reference 1/255, forward.cu:343-351). Splats
    # below the gate contribute nothing AND receive zero gradient — with
    # --antialiasing on a model trained without it, the compensation pushes
    # most thin-segment alphas under 1/255 and freezes them (they can never
    # brighten/widen back). Lowering the gate (e.g. 1e-5) restores gradient
    # flow at the cost of more surviving pairs; raising it is a perf lever.
    # The cull radius stays exact against whatever gate is set.
    alpha_min: float = 1.0 / 255.0

    def __post_init__(self):
        assert self.max_pairs_per_tile % self.chunk == 0


def render(
    camera: Camera,
    *,
    means3d: jnp.ndarray,
    opacity: jnp.ndarray,
    features: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    width: int,
    height: int,
    config: RasterConfig = RasterConfig(),
):
    """Differentiable multi-channel splatting render.

    Args:
        means3d: (N,3); opacity: (N,); features: (N,C) per-Gaussian channels
        scales (N,3) + rotations (N,4 wxyz), or cov3d_precomp (N,3,3)
        bg: (C,) background, composited as out + T_final * bg (forward.cu:372)
        active: (N,) bool arena mask; inactive rows are culled
        mean2d_offset: (N,2) zeros; its gradient reproduces CUDA dL_dmean2D
    Returns dict with render (H,W,C), final_T (H,W), radii (N,), visibility
    (N,), and overflow diagnostics.
    """
    ts = config.tile_size
    grid_w = (width + ts - 1) // ts
    grid_h = (height + ts - 1) // ts

    # Pallas path: the viewspace-gradient hook rides the packed aux rows
    # (photometric-only gradients from the dual-cotangent backward); the
    # XLA path keeps the additive-offset hook in preprocess.
    prep = preprocess(
        means3d,
        scales,
        rotations,
        camera,
        width,
        height,
        ts,
        active=active,
        scale_modifier=scale_modifier,
        cov3d_precomp=cov3d_precomp,
        mean2d_offset=None if config.use_pallas else mean2d_offset,
        opacity=opacity,
        antialiasing=config.antialiasing,
        alpha_min=config.alpha_min,
    )

    opa_eff = jnp.where(prep.valid, opacity, 0.0)
    if config.antialiasing:
        opa_eff = opa_eff * prep.compensation
    # alpha-cutoff exponent for the exact tile cull: a tile whose min
    # quadratic exceeds ln(opa/alpha_min) can never pass the alpha gate
    q_cut = jax.lax.stop_gradient(
        jnp.log(jnp.maximum(opa_eff, 1e-12) / config.alpha_min)
    )
    num_channels = features.shape[-1]
    image_photo = None

    if config.use_pallas:
        from hairgs_tpu.render.binning import bin_gaussians_sorted, gather_pairs
        from hairgs_tpu.render.pallas_composite import (
            composite_pairs,
            pack_geo_rows,
            pad_feat_rows,
        )

        binning = bin_gaussians_sorted(
            prep.rect, prep.depth, prep.valid, grid_w, grid_h,
            config.max_tiles_per_gaussian, config.max_pairs_per_tile,
            config.chunk,
            xy=jax.lax.stop_gradient(prep.xy),
            conic=jax.lax.stop_gradient(prep.conic), q_cut=q_cut,
            tile_size=ts,
            pair_capacity=config.pair_capacity,
        )
        # NaN hygiene for inactive rows (mirrors the XLA path's slot zeroing)
        feat_eff = jnp.where(prep.valid[:, None], features, 0.0)
        aux = None
        if mean2d_offset is not None:
            # CUDA dL_dmean2D units: pixel grads x (0.5W, 0.5H)
            aux = mean2d_offset * jnp.asarray(
                [0.5 * width, 0.5 * height], dtype=jnp.float32
            )
        geo_packed = pack_geo_rows(prep.xy, prep.conic, opa_eff, aux=aux)
        feat_packed = pad_feat_rows(feat_eff, config.feat_bf16)
        r_max = config.max_tiles_per_gaussian

        def with_zero_row(t):
            # zero row: target of padding slots (virtual index n*r_max)
            return jnp.concatenate(
                [t, jnp.zeros((1, t.shape[1]), t.dtype)], axis=0
            )

        geo_paged = gather_pairs(with_zero_row(geo_packed), binning.paged_src,
                                 binning.inv_paged, r_max)
        feat_paged = gather_pairs(with_zero_row(feat_packed),
                                  binning.paged_src, binning.inv_paged, r_max)
        interpret = jax.default_backend() != "tpu"
        max_chunks = config.max_pairs_per_tile // config.chunk
        tiles, tiles_photo, trans_tiles = composite_pairs(
            geo_paged.T, feat_paged.T, binning.starts, binning.counts,
            grid_w, grid_h, ts, config.chunk, max_chunks, num_channels,
            interpret, config.tiles_per_step, config.viewspace_stats,
            config.dma_lookahead, config.alpha_min,
        )
        image_photo = assemble_image(tiles_photo, grid_w, grid_h, ts, height, width)
    else:
        binning = bin_gaussians(
            prep.rect,
            prep.depth,
            prep.valid,
            grid_w,
            grid_h,
            config.max_tiles_per_gaussian,
            config.max_pairs_per_tile,
            xy=jax.lax.stop_gradient(prep.xy),
            conic=jax.lax.stop_gradient(prep.conic), q_cut=q_cut,
            tile_size=ts,
        )

        gid = binning.gather_idx  # (NT, K)
        pv = binning.pair_valid
        # zero every invalid slot: clamped gather indices may alias rows whose
        # (inactive) attributes are NaN — 0*NaN would poison forward and VJP
        xy_g = jnp.where(pv[..., None], prep.xy[gid], 0.0)
        con_g = jnp.where(pv[..., None], prep.conic[gid], 0.0)
        opa_g = jnp.where(pv, opa_eff[gid], 0.0)
        feat_g = jnp.where(pv[..., None], features[gid], 0.0)

        tiles, trans_tiles = composite(
            xy_g, con_g, opa_g, feat_g, grid_w, grid_h, ts, config.chunk,
            config.alpha_min,
        )

    image = assemble_image(tiles, grid_w, grid_h, ts, height, width)
    final_t = assemble_image(trans_tiles, grid_w, grid_h, ts, height, width)
    if bg is not None:
        image = image + final_t[..., None] * bg
        if image_photo is not None:
            image_photo = image_photo + final_t[..., None] * bg

    return {
        "render": image,
        # identical values to "render"; photometric losses must be computed
        # from this view so the dual-cotangent backward can split the
        # viewspace statistics (pallas path only; equals "render" otherwise)
        "render_photo": image_photo if image_photo is not None else image,
        "final_T": final_t,
        "radii": prep.radius,
        "visibility_filter": prep.radius > 0,
        "overflow_pairs": binning.overflow_pairs,
        "overflow_tiles": binning.overflow_tiles,
        # compact-table diagnostics. overflow_capacity is pallas-only (the
        # XLA layout has no pair_capacity); pairs_demand is reported on both
        # paths — on XLA it is the chunk-padded slot count the paged pallas
        # table WOULD need, so drivers (and the CPU multichip dryrun) see a
        # live metric regardless of backend.
        "overflow_capacity": (binning.overflow_capacity
                              if config.use_pallas else jnp.zeros((), jnp.int32)),
        "pairs_demand": (binning.pairs_demand if config.use_pallas else
                         (jnp.sum((jnp.minimum(binning.tile_counts,
                                               config.max_pairs_per_tile)
                                   + config.chunk - 1)
                                  // config.chunk) * config.chunk
                          + config.chunk).astype(jnp.int32)),
        "tile_counts": (binning.counts if config.use_pallas else binning.tile_counts),
    }


def sh_to_color(features_dc, features_rest, means3d, cam_center, active_sh_degree: int,
                max_sh_degree: int):
    """SH -> RGB with the 0-clamp of forward.cu:20-71 (computeColorFromSH).

    features_dc (N,1,3), features_rest (N,K-1,3); returns (N,3).
    The clamp's gradient-zeroing (the CUDA `clamped` bookkeeping) falls out of
    jnp.maximum automatically.
    """
    from hairgs_tpu.core.maths import safe_norm

    sh = jnp.concatenate([features_dc, features_rest], axis=1)  # (N,K,3)
    sh = jnp.swapaxes(sh, 1, 2)  # (N,3,K)
    dirs = means3d - cam_center
    dirs = dirs / safe_norm(dirs, axis=-1, keepdims=True)
    rgb = eval_sh(active_sh_degree, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)
