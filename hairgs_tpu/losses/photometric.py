"""Photometric + mask + orientation losses on the fused multi-channel render.

Parity targets: reference loss/losses.py —
- l1/l2 (l.16-21), SSIM weighting in loss_function (l.319-355)
- mask_loss_rast (l.292-316): BCEWithLogitsLoss applied to the *already
  sigmoided* rendered mask channel (the reference's double-squashing is
  replicated deliberately)
- orientation_loss_rast (l.224-289): rendered world direction -> view ->
  screen angle in [0,pi) -> confidence-weighted bidirectional difference.

The reference re-rasterizes for the mask and orientation losses with
override_color; here they are channels of the single fused render (bg = 0 in
training makes this numerically identical).
"""

import jax.numpy as jnp

from hairgs_tpu.core.maths import MIN_VAL, safe_norm
from hairgs_tpu.models.gaussian import MASK, ORIENT, RGB
from hairgs_tpu.ops.ssim import ssim


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(a, b):
    """Peak signal-to-noise ratio in dB for [0,1]-range images:
    -10*log10(MSE). The headline image-quality acceptance metric (the
    reference repo never computes it; the standard 3DGS eval does)."""
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def masked_psnr(a, b, mask):
    """PSNR restricted to mask>0 pixels (hair region); mask is (H,W) for
    (H,W,C) images."""
    if mask.ndim == a.ndim - 1:
        mask = mask[..., None]
    denom = jnp.maximum(jnp.sum(mask) * (a.shape[-1] / mask.shape[-1]), 1.0)
    mse = jnp.sum(((a - b) ** 2) * mask) / denom
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def bce_with_logits(logits, targets):
    """torch.nn.BCEWithLogitsLoss (mean reduction)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bidirectional_angle_difference(a1, a2):
    """min angular difference mod pi; loss/losses.py:87-103."""
    half_pi = jnp.pi / 2
    return half_pi - jnp.abs(jnp.abs(a1 - a2) - half_pi)


def mask_loss_from_channel(rendered_mask, gt_mask):
    """BCEWithLogits on the rendered (sigmoided) mask channel vs {0,1} GT —
    replicates the double squashing of loss/losses.py:311-315."""
    return bce_with_logits(rendered_mask, gt_mask)


def orientation_loss_from_channels(orient_world, camera):
    """Confidence-weighted bidirectional screen-angle difference.

    orient_world: (H,W,3) rendered world-space direction channels.
    Uses camera.mask to select hair pixels (the reference falls back to a
    non-background test only when no mask exists, loss/losses.py:274-279).
    """
    o_view = orient_world @ camera.world_view[:3, :3].T  # world -> view rotation
    xy = o_view[..., :2]
    norm = safe_norm(xy, axis=-1, keepdims=True)
    xy = xy / (norm + MIN_VAL)
    x = xy[..., 0]
    y = xy[..., 1]
    y = jnp.where(y < MIN_VAL, y + MIN_VAL, y)
    theta = jnp.arctan2(x, y)
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)
    diff = bidirectional_angle_difference(theta, camera.orientation)
    confidence = (
        camera.confidence if camera.confidence is not None
        else jnp.ones_like(diff)
    )
    weighted = diff * confidence
    if camera.mask is not None:
        sel = camera.mask
    else:
        sel = jnp.any(orient_world != 0.0, axis=-1).astype(weighted.dtype)
    denom = jnp.maximum(jnp.sum(sel), 1.0)
    return jnp.sum(weighted * sel) / denom


def compute_losses(channels, camera, opt_cfg, extra_losses=None):
    """Composite training loss; reference loss_function (loss/losses.py:319-355).

    channels: fused render (H,W,7) with layout RGB / MASK / ORIENT.
    extra_losses: dict of precomputed strand terms {"smooth": x, "magnet": y}.
    Returns (loss, loss_dict).
    """
    image = channels[..., RGB]
    gt = camera.image
    loss_dict = {}
    loss_dict["l1"] = l1_loss(image, gt)
    loss = max(0.0, 1.0 - opt_cfg.lambda_dssim) * loss_dict["l1"]
    loss_dict["dssim"] = 1.0 - ssim(image, gt)
    loss = loss + opt_cfg.lambda_dssim * loss_dict["dssim"]
    if opt_cfg.lambda_mask > 0 and camera.mask is not None:
        loss_dict["mask"] = mask_loss_from_channel(channels[..., MASK], camera.mask)
        loss = loss + opt_cfg.lambda_mask * loss_dict["mask"]
    if opt_cfg.lambda_orientation > 0 and camera.orientation is not None:
        loss_dict["orientation"] = orientation_loss_from_channels(
            channels[..., ORIENT], camera
        )
        loss = loss + opt_cfg.lambda_orientation * loss_dict["orientation"]
    if extra_losses:
        for name, value in extra_losses.items():
            lam = getattr(opt_cfg, f"lambda_{name}")
            if lam > 0:
                loss_dict[name] = value
                loss = loss + lam * value
    return loss, loss_dict
