"""Per-Gaussian preprocessing: frustum cull, EWA 3D->2D covariance projection,
conic/radius/tile-rect computation.

Parity targets (numerics replicated exactly):
- forward.cu:74-113  (computeCov2D: J/W products, 1.3*tanfov clamping, +0.3 px low-pass)
- forward.cu:118-152 (computeCov3D: Sigma = R S S^T R^T)
- forward.cu:156-256 (preprocessCUDA: culling, conic, 3-sigma radius, tile rect)
- auxiliary.h:41-56  (ndc2Pix, getRect), auxiliary.h:139-164 (in_frustum z>0.2)

Everything is batched jnp over the N-Gaussian axis; XLA fuses this into a
handful of elementwise kernels — there is no benefit to a hand-written Pallas
kernel here (no reuse, no matmul structure).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hairgs_tpu.core.transforms import build_rotation


class Preprocessed(NamedTuple):
    valid: jnp.ndarray  # (N,) bool — survives culling, radius > 0
    depth: jnp.ndarray  # (N,) view-space z
    xy: jnp.ndarray  # (N,2) pixel-space mean
    conic: jnp.ndarray  # (N,3) inverse 2D covariance (a, b, c)
    radius: jnp.ndarray  # (N,) float pixel radius (ceil'd, always 3-sigma)
    rect: jnp.ndarray  # (N,4) int32 BINNING tile rect [xmin,ymin,xmax,ymax)
    tiles_touched: jnp.ndarray  # (N,) int32 (3-sigma rect, validity/ref parity)
    cull_radius: jnp.ndarray = None  # (N,) alpha-cutoff radius (<= radius)
    compensation: jnp.ndarray = None  # (N,) Mip-Splatting opacity factor
    # (only when preprocess(antialiasing=True); 0 on culled rows)


def ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov3d(scales, rotations, scale_modifier=1.0):
    """World-space covariance (N,3,3) = R S S^T R^T (forward.cu:118-152)."""
    R = build_rotation(rotations)
    S = scales * scale_modifier  # (N,3)
    M = R * S[..., None, :]  # R @ diag(S)
    return M @ jnp.swapaxes(M, -1, -2)


def project_cov2d(mean3d, cov3d, world_view, focal_x, focal_y, tanfovx, tanfovy,
                  return_compensation=False):
    """EWA projection of world covariance to 2D screen covariance.

    Returns (N,3): (cov_xx, cov_xy, cov_yy) with the +0.3 pixel low-pass
    applied (forward.cu:74-113).

    return_compensation: also return the Mip-Splatting opacity compensation
    sqrt(det(cov) / det(cov + 0.3 I)) in (0, 1] — the factor by which the
    low-pass dilation inflates a Gaussian's integrated screen-space energy
    (Yu et al., "Mip-Splatting", CVPR 2024, eq. 9). The reference applies
    the dilation uncompensated (forward.cu:110); the compensated mode is an
    opt-in improvement (RasterConfig.antialiasing).
    """
    Wm = world_view[:3, :3]
    t = mean3d @ Wm.T + world_view[:3, 3]
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    # Guard the depth divisions BEFORE dividing: rows at/behind the camera
    # plane (tz <= 0.2 is frustum-culled downstream, and arena PAD rows sit
    # at the world origin, which IS a ring camera's plane) otherwise produce
    # inf/overflow in the forward that `valid` masks — but the VJP still
    # evaluates 0-cotangent * inf-derivative = NaN into xyz/scaling/rotation
    # (round-4 on-TPU parity FAIL root cause; reproduced on CPU). The 0.19
    # threshold sits strictly below the 0.2 frustum cull (with margin far
    # above ulp reordering noise between this tz and preprocess's p_view_z),
    # so every guarded row is culled and its (finite, garbage) cov is masked.
    tz = jnp.where(t[..., 2] > 0.19, t[..., 2], 1.0)
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J = [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]  (2x3 rows)
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_tz, zeros, -focal_x * tx * inv_tz2], axis=-1),
            jnp.stack([zeros, focal_y * inv_tz, -focal_y * ty * inv_tz2], axis=-1),
        ],
        axis=-2,
    )  # (N,2,3)
    M = J @ Wm  # (N,2,3)
    cov = M @ cov3d @ jnp.swapaxes(M, -1, -2)  # (N,2,2)
    c_xx = cov[..., 0, 0]
    c_xy = cov[..., 0, 1]
    c_yy = cov[..., 1, 1]
    out = jnp.stack([c_xx + 0.3, c_xy, c_yy + 0.3], axis=-1)
    if not return_compensation:
        return out
    det_raw = c_xx * c_yy - c_xy * c_xy
    det_blur = (c_xx + 0.3) * (c_yy + 0.3) - c_xy * c_xy
    # Both determinants are where-clamped BELOW a positive epsilon before the
    # sqrt (Mip-Splatting kernel pattern): thin strands routinely cancel to
    # det_raw <= 0, and sqrt/maximum VJPs evaluated at 0 emit NaN (0*inf)
    # that a downstream where cannot remove. The where-guard gives a zero
    # gradient on the clamped branch and bounds the ~1/sqrt(det) gradient
    # for near-degenerate rows.
    eps = 1e-6
    det_raw_safe = jnp.where(det_raw > eps, det_raw, eps)
    det_blur_safe = jnp.where(det_blur > eps, det_blur, eps)
    comp = jnp.sqrt(det_raw_safe / det_blur_safe)
    return out, comp


def preprocess(
    mean3d,
    scales,
    rotations,
    camera,
    width: int,
    height: int,
    tile_size: int,
    active=None,
    scale_modifier: float = 1.0,
    cov3d_precomp=None,
    mean2d_offset=None,
    opacity=None,
    antialiasing: bool = False,
    alpha_min: float = 1.0 / 255.0,
) -> Preprocessed:
    """Vectorized preprocess over all Gaussians.

    mean2d_offset: optional (N,2) zero tensor in *NDC half-extent units*; the
    gradient w.r.t. it equals the CUDA dL_dmean2D (backward_original.cu:460-546
    scales pixel grads by 0.5*W / 0.5*H) and drives densification stats.

    opacity: optional (N,) ACTIVATED opacity. When given, the binning rect
    uses the exact alpha-cutoff radius min(3*sigma, r_alpha) where
    alpha <= opa * exp(-0.5 d^2 / lambda_max) < 1/255 beyond r_alpha — every
    pixel of a dropped tile fails the compositor's ALPHA_MIN gate, so the
    render is bit-identical with strictly fewer pairs (the CUDA reference
    always bins the full 3-sigma square, forward.cu:232). The `radius`
    output and the validity semantics keep the reference's 3-sigma values.

    antialiasing: compute the Mip-Splatting dilation compensation factor
    (see project_cov2d); the cull radius then uses the compensated opacity,
    which is tighter yet still exact against the compositor's ALPHA_MIN gate.
    """
    grid_w = (width + tile_size - 1) // tile_size
    grid_h = (height + tile_size - 1) // tile_size

    focal_x = width / (2.0 * camera.tanfovx)
    focal_y = height / (2.0 * camera.tanfovy)

    ones = jnp.ones_like(mean3d[..., :1])
    p_hom = jnp.concatenate([mean3d, ones], axis=-1) @ camera.full_proj.T
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]

    p_view_z = mean3d @ camera.world_view[2, :3] + camera.world_view[2, 3]
    in_frustum = p_view_z > 0.2  # auxiliary.h:154

    if cov3d_precomp is None:
        cov3d = compute_cov3d(scales, rotations, scale_modifier)
    else:
        cov3d = cov3d_precomp
    compensation = None
    if antialiasing:
        cov, compensation = project_cov2d(
            mean3d, cov3d, camera.world_view, focal_x, focal_y,
            camera.tanfovx, camera.tanfovy, return_compensation=True)
    else:
        cov = project_cov2d(mean3d, cov3d, camera.world_view, focal_x, focal_y, camera.tanfovx, camera.tanfovy)

    det = cov[..., 0] * cov[..., 2] - cov[..., 1] * cov[..., 1]
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack(
        [cov[..., 2] * det_inv, -cov[..., 1] * det_inv, cov[..., 0] * det_inv], axis=-1
    )

    mid = 0.5 * (cov[..., 0] + cov[..., 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    xy = jnp.stack([ndc2pix(p_proj[..., 0], width), ndc2pix(p_proj[..., 1], height)], axis=-1)
    if mean2d_offset is not None:
        # gradient hook: scaled so dL/d offset matches CUDA dL_dmean2D units
        xy = xy + mean2d_offset * jnp.asarray([0.5 * width, 0.5 * height], dtype=xy.dtype)

    def tile_rect(r):
        # tile rect (auxiliary.h:46-56)
        rxmin = jnp.clip(jnp.floor((xy[..., 0] - r) / tile_size), 0, grid_w).astype(jnp.int32)
        rymin = jnp.clip(jnp.floor((xy[..., 1] - r) / tile_size), 0, grid_h).astype(jnp.int32)
        rxmax = jnp.clip(jnp.floor((xy[..., 0] + r + tile_size - 1) / tile_size), 0, grid_w).astype(jnp.int32)
        rymax = jnp.clip(jnp.floor((xy[..., 1] + r + tile_size - 1) / tile_size), 0, grid_h).astype(jnp.int32)
        return rxmin, rymin, rxmax, rymax

    rxmin, rymin, rxmax, rymax = tile_rect(radius)
    tiles_touched = (rxmax - rxmin) * (rymax - rymin)

    cull_radius = radius
    if opacity is not None:
        opa_cull = jax.lax.stop_gradient(opacity)
        if compensation is not None:
            opa_cull = opa_cull * jax.lax.stop_gradient(compensation)
        r_alpha2 = 2.0 * jax.lax.stop_gradient(lambda1) * jnp.log(
            jnp.maximum(opa_cull / alpha_min, 1.0)
        )
        # +1px slack absorbs the float boundary (the gate is alpha>=alpha_min)
        cull_radius = jnp.minimum(radius, jnp.ceil(jnp.sqrt(r_alpha2)) + 1.0)
        rxmin, rymin, rxmax, rymax = tile_rect(cull_radius)

    valid = in_frustum & det_ok & (tiles_touched > 0)
    if active is not None:
        valid = valid & active
    tiles_touched = jnp.where(valid, tiles_touched, 0)
    radius = jnp.where(valid, radius, 0.0)

    # sanitize culled rows: inactive arena rows can carry degenerate inputs
    # (zero quaternions etc.) whose NaN/Inf would otherwise leak through
    # 0*NaN in the compositor and its VJP
    conic = jnp.where(valid[..., None], conic, 0.0)
    xy = jnp.where(valid[..., None], xy, 0.0)
    if compensation is not None:
        compensation = jnp.where(valid, compensation, 0.0)

    rect = jnp.stack([rxmin, rymin, rxmax, rymax], axis=-1)
    return Preprocessed(
        valid=valid,
        depth=p_view_z,
        xy=xy,
        conic=conic,
        radius=radius,
        rect=rect,
        tiles_touched=tiles_touched,
        cull_radius=cull_radius,
        compensation=compensation,
    )
