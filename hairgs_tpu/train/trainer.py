"""Jitted training steps for Stage I (GaussianModel) and Stage III (HairGS).

Replaces the reference hot loop (train.py:91-254): render -> loss -> backward
-> densification-stat accumulation -> Adam, all fused into one compiled XLA
program per step. The reference issues three rasterizations per step plus
host-side optimizer work; here it is a single fused multi-channel render and
a pure on-device update.

Supports a view minibatch (vmapped over cameras) — the natural data
parallelism of multi-view splatting; batch axis is shardable over a device
mesh (see hairgs_tpu/parallel/mesh.py).
"""

import functools

import jax
import jax.numpy as jnp

from hairgs_tpu.core.schedules import expon_lr
from hairgs_tpu.losses.strand import angle_smoothness_loss
from hairgs_tpu.models.gaussian import GaussianParams, GaussianStats, gaussian_render_inputs
from hairgs_tpu.models.hair import HairParams, hair_render_inputs
from hairgs_tpu.optim import adam_step
from hairgs_tpu.render.renderer import RasterConfig, render


def gaussian_lr_tree(opt_cfg, step, spatial_lr_scale):
    """Per-group LRs (scene/gaussian_model.py:216-258)."""
    xyz_lr = expon_lr(
        step,
        opt_cfg.position_lr_init * spatial_lr_scale,
        opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    return GaussianParams(
        xyz=xyz_lr,
        features_dc=opt_cfg.feature_lr,
        features_rest=opt_cfg.feature_lr / 20.0,
        scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
        opacity=opt_cfg.opacity_lr,
        mask=opt_cfg.mask_lr,
    )


def hair_lr_tree(opt_cfg, step, spatial_lr_scale):
    """Per-group LRs for the hair model (hair_gaussian_model.py:221-252)."""
    pos_lr = expon_lr(
        step,
        opt_cfg.position_lr_init * spatial_lr_scale,
        opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    return HairParams(
        endpoints=pos_lr,
        features_dc=opt_cfg.feature_lr,
        features_rest=opt_cfg.feature_lr / 20.0,
        opacity=opt_cfg.opacity_lr,
        mask=opt_cfg.mask_lr,
        width=opt_cfg.scaling_lr,
    )


def _update_stats(stats: GaussianStats, radii, offset_grad, active):
    """Densification statistics (scene/gaussian_model.py:675-682):
    max screen radius, accumulated viewspace-gradient norm, visit count.

    Accepts per-view batched inputs (radii (B,N), offset_grad (B,N,2)): a
    K-view step then accumulates exactly like K reference iterations — one
    gradient-norm + visit count per visible view, NOT the norm of the view
    mean (which under-counts through cancellation)."""
    if radii.ndim == 1:
        radii = radii[None]
        offset_grad = offset_grad[None]
    vis = (radii > 0) & active[None]  # (B, N)
    best = jnp.max(jnp.where(vis, radii, 0), axis=0)
    max_radii2d = jnp.maximum(stats.max_radii2d, best)
    gnorm = jnp.linalg.norm(offset_grad[..., :2], axis=-1, keepdims=True)  # (B,N,1)
    xyz_grad_accum = stats.xyz_grad_accum + jnp.sum(
        jnp.where(vis[..., None], gnorm, 0.0), axis=0
    )
    denom = stats.denom + jnp.sum(vis[..., None], axis=0).astype(stats.denom.dtype)
    return GaussianStats(max_radii2d=max_radii2d, xyz_grad_accum=xyz_grad_accum, denom=denom)


def _photometric_loss(channels, camera, opt_cfg):
    """The l1 + D-SSIM part only — this is what drives densification stats in
    the reference (train.py:173-177 reads the grad of the *first* render's
    screenspace tensor; the mask/orientation re-renders have their own,
    discarded, screenspace tensors)."""
    from hairgs_tpu.losses.photometric import l1_loss, psnr
    from hairgs_tpu.ops.ssim import ssim

    image = channels[..., :3]
    l1 = l1_loss(image, camera.image)
    dssim = 1.0 - ssim(image, camera.image)
    loss = max(0.0, 1.0 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * dssim
    # train-view PSNR rides along as a free diagnostic (aux only, no grad)
    train_psnr = psnr(jnp.clip(jax.lax.stop_gradient(image), 0.0, 1.0), camera.image)
    return loss, {"l1": l1, "dssim": dssim, "psnr": train_psnr}


def _auxiliary_loss(channels, camera, opt_cfg):
    """Mask + orientation terms on the fused channels."""
    from hairgs_tpu.losses.photometric import (
        mask_loss_from_channel,
        orientation_loss_from_channels,
    )
    from hairgs_tpu.models.gaussian import MASK, ORIENT

    loss = jnp.zeros(())
    loss_dict = {}
    if opt_cfg.lambda_mask > 0 and camera.mask is not None:
        loss_dict["mask"] = mask_loss_from_channel(channels[..., MASK], camera.mask)
        loss = loss + opt_cfg.lambda_mask * loss_dict["mask"]
    if opt_cfg.lambda_orientation > 0 and camera.orientation is not None:
        loss_dict["orientation"] = orientation_loss_from_channels(
            channels[..., ORIENT], camera
        )
        loss = loss + opt_cfg.lambda_orientation * loss_dict["orientation"]
    return loss, loss_dict


def render_loss_and_grads(render_inputs_fn, params, camera, active, opt_cfg,
                          raster_cfg, width, height, render_fn=render):
    """One fused forward; two cotangent pulls through the shared VJP.

    The render runs ONCE (vs 3x in the reference); its linear VJP is applied
    twice: with the total-loss cotangent for parameter gradients and with the
    photometric-only cotangent for the viewspace densification statistics
    (matching reference semantics where stats come from the rgb render only).
    Returns (loss, param_grads, offset_grad, aux).

    render_fn must match render()'s surface; parallel/slab.py substitutes a
    depth-slab sharded renderer here for Gaussian-axis scale-out.
    """
    offset0 = jnp.zeros((active.shape[0], 2), dtype=jnp.float32)

    def channels_fn(p, offset):
        inputs = render_inputs_fn(p)
        out = render_fn(
            camera, **inputs, active=active, mean2d_offset=offset,
            width=width, height=height, config=raster_cfg,
        )
        aux = dict(
            radii=out["radii"],
            overflow_pairs=out["overflow_pairs"],
            overflow_tiles=out["overflow_tiles"],
            overflow_capacity=out["overflow_capacity"],
            pairs_demand=out["pairs_demand"],
        )
        # two views of the same render: photometric losses read the second so
        # the pallas dual-cotangent backward can split the viewspace stats
        return (out["render"], out["render_photo"]), aux

    (channels, channels_photo), vjp_fn, aux = jax.vjp(
        channels_fn, params, offset0, has_aux=True
    )
    (photo_loss, photo_parts), g_photo = jax.value_and_grad(
        lambda ch: _photometric_loss(ch, camera, opt_cfg), has_aux=True
    )(channels_photo)
    (aux_loss, aux_parts), g_aux = jax.value_and_grad(
        lambda ch: _auxiliary_loss(ch, camera, opt_cfg), has_aux=True
    )(channels)
    param_grads, offset_grad = vjp_fn((g_aux, g_photo))
    if not raster_cfg.use_pallas:
        # XLA path: "render_photo" aliases "render", so the joint pull gives
        # total-loss offset grads; pull once more for the photometric-only
        # viewspace statistics (the pallas path gets them from the aux rows
        # of the same backward — no second pull)
        _, offset_grad = vjp_fn((jnp.zeros_like(g_aux), g_photo))
    loss = photo_loss + aux_loss
    aux = dict(
        loss_dict={**photo_parts, **aux_parts},
        radii=aux["radii"],
        overflow_pairs=aux["overflow_pairs"],
        overflow_tiles=aux["overflow_tiles"],
        overflow_capacity=aux["overflow_capacity"],
        pairs_demand=aux["pairs_demand"],
        image=channels[..., :3],
    )
    return loss, param_grads, offset_grad, aux


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _per_view(fn, camera):
    """Run fn over a single camera or vmap over a view batch, averaging
    gradients/losses (batch axis is shardable across the device mesh)."""
    if camera.world_view.ndim == 3:
        losses, grads, offset_grads, auxes = jax.vmap(fn)(camera)
        loss = jnp.mean(losses)
        grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads)
        aux = dict(
            loss_dict=jax.tree.map(jnp.mean, auxes["loss_dict"]),
            # radii / offset grads stay per-view: _update_stats accumulates
            # them like K separate reference iterations
            radii=auxes["radii"],
            overflow_pairs=jnp.sum(auxes["overflow_pairs"]),
            overflow_tiles=jnp.sum(auxes["overflow_tiles"]),
            overflow_capacity=jnp.sum(auxes["overflow_capacity"]),
            # capacity must cover the largest single view
            pairs_demand=jnp.max(auxes["pairs_demand"]),
            image=auxes["image"][0],
        )
        return loss, grads, offset_grads, aux
    return fn(camera)


def make_gaussian_train_step(
    opt_cfg,
    raster_cfg: RasterConfig,
    *,
    width: int,
    height: int,
    active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
):
    """Build the jitted Stage-I train step.

    Signature: step_fn(params, stats, opt_state, active, camera, step)
    -> (params, stats, opt_state, metrics, image). `camera` may be a single
    Camera or a batched Camera (leading axis = view minibatch).
    """

    # donate the mutable arenas (params/stats/Adam moments): XLA updates them
    # in place instead of allocating a second copy and round-tripping HBM
    # every step (`active` and the camera batch are reused by the caller)
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, stats, opt_state, active, camera, step):
        def one_view(cam):
            return render_loss_and_grads(
                lambda p: gaussian_render_inputs(p, cam.cam_center, active_sh_degree),
                params, cam, active, opt_cfg, raster_cfg, width, height,
            )

        loss, grads, offset_grad, aux = _per_view(one_view, camera)
        stats = _update_stats(stats, aux["radii"], offset_grad, active)
        lr_tree = gaussian_lr_tree(opt_cfg, step, spatial_lr_scale)
        params, opt_state = adam_step(params, grads, opt_state, lr_tree)
        train_psnr = aux["loss_dict"].pop("psnr")
        metrics = dict(loss=loss, psnr=train_psnr,
                       **{f"loss/{k}": v for k, v in aux["loss_dict"].items()},
                       overflow_pairs=aux["overflow_pairs"],
                       overflow_tiles=aux["overflow_tiles"],
                       overflow_capacity=aux["overflow_capacity"],
                       pairs_demand=aux["pairs_demand"])
        return params, stats, opt_state, metrics, aux["image"]

    return step_fn


def make_hair_train_step(
    opt_cfg,
    raster_cfg: RasterConfig,
    *,
    width: int,
    height: int,
    active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
    dist_to_scale_factor: float,
    use_smooth: bool = True,
    use_magnet: bool = False,
):
    """Build the jitted Stage-III train step.

    Extra args vs Stage I: the (non-differentiable) segment graph, and the
    consecutive-segment index pairs for the smoothness regularizer (constant
    between topology changes, recomputed host-side after each). With
    use_magnet, magnet_idx = (strand_endpoint_ids, complementary_ids, valid)
    from topo.strands.magnet_indices must be passed as well.
    """

    # donate params/stats/opt_state (graph and index tables are reused
    # across steps by the caller and must not be donated)
    @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
    def step_fn(params, graph, stats, opt_state, camera, step, smooth_pairs,
                smooth_valid, magnet_idx=None):
        def one_view(cam):
            return render_loss_and_grads(
                lambda p: hair_render_inputs(p, graph, cam.cam_center,
                                             active_sh_degree, dist_to_scale_factor),
                params, cam, graph.seg_active, opt_cfg, raster_cfg, width, height,
            )

        loss, grads, offset_grad, aux = _per_view(one_view, camera)

        # strand regularizers act on the endpoints directly (no render path)
        if use_smooth and opt_cfg.lambda_smooth > 0:
            def smooth_fn(p):
                return opt_cfg.lambda_smooth * angle_smoothness_loss(
                    p.endpoints, smooth_pairs, smooth_valid
                )

            smooth_loss, smooth_grads = jax.value_and_grad(smooth_fn)(params)
            loss = loss + smooth_loss
            grads = _tree_add(grads, smooth_grads)
            aux["loss_dict"] = dict(aux["loss_dict"],
                                    smooth=smooth_loss / opt_cfg.lambda_smooth)

        if use_magnet and opt_cfg.lambda_magnet > 0 and magnet_idx is not None:
            from hairgs_tpu.losses.strand import strand_joints_magnet_loss

            m_ids, m_comp, m_valid = magnet_idx

            def magnet_fn(p):
                return opt_cfg.lambda_magnet * strand_joints_magnet_loss(
                    p.endpoints, m_ids, m_comp, m_valid
                )

            magnet_loss, magnet_grads = jax.value_and_grad(magnet_fn)(params)
            loss = loss + magnet_loss
            grads = _tree_add(grads, magnet_grads)
            aux["loss_dict"] = dict(aux["loss_dict"],
                                    magnet=magnet_loss / opt_cfg.lambda_magnet)

        stats = _update_stats(stats, aux["radii"], offset_grad, graph.seg_active)
        lr_tree = hair_lr_tree(opt_cfg, step, spatial_lr_scale)
        params, opt_state = adam_step(params, grads, opt_state, lr_tree)
        train_psnr = aux["loss_dict"].pop("psnr")
        metrics = dict(loss=loss, psnr=train_psnr,
                       **{f"loss/{k}": v for k, v in aux["loss_dict"].items()},
                       overflow_pairs=aux["overflow_pairs"],
                       overflow_tiles=aux["overflow_tiles"],
                       overflow_capacity=aux["overflow_capacity"],
                       pairs_demand=aux["pairs_demand"])
        return params, stats, opt_state, metrics, aux["image"]

    return step_fn
