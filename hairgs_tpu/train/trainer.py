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
from typing import Optional

import jax
import jax.numpy as jnp

from hairgs_tpu.core.schedules import expon_lr
from hairgs_tpu.losses.photometric import compute_losses
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
    max screen radius, accumulated viewspace-gradient norm, visit count."""
    vis = (radii > 0) & active
    max_radii2d = jnp.where(vis, jnp.maximum(stats.max_radii2d, radii), stats.max_radii2d)
    gnorm = jnp.linalg.norm(offset_grad[:, :2], axis=-1, keepdims=True)
    xyz_grad_accum = stats.xyz_grad_accum + jnp.where(vis[:, None], gnorm, 0.0)
    denom = stats.denom + vis[:, None].astype(stats.denom.dtype)
    return GaussianStats(max_radii2d=max_radii2d, xyz_grad_accum=xyz_grad_accum, denom=denom)


def _render_and_loss(render_inputs, camera, active, offset, opt_cfg, raster_cfg,
                     width, height, extra_losses=None):
    out = render(
        camera,
        **render_inputs,
        active=active,
        mean2d_offset=offset,
        width=width,
        height=height,
        config=raster_cfg,
    )
    loss, loss_dict = compute_losses(out["render"], camera, opt_cfg, extra_losses)
    aux = dict(
        loss_dict=loss_dict,
        radii=out["radii"],
        overflow_pairs=out["overflow_pairs"],
        overflow_tiles=out["overflow_tiles"],
        image=out["render"][..., :3],
    )
    return loss, aux


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
    -> (params, stats, opt_state, metrics). `camera` may be a single Camera
    or a batched Camera (leading axis = view minibatch).
    """

    def loss_fn(params: GaussianParams, offset, active, camera):
        inputs = gaussian_render_inputs(params, camera.cam_center, active_sh_degree)
        return _render_and_loss(inputs, camera, active, offset, opt_cfg, raster_cfg,
                                width, height)

    def batched_loss(params, offset, active, camera):
        if camera.world_view.ndim == 3:  # batched views
            losses, auxes = jax.vmap(
                lambda cam: loss_fn(params, offset, active, cam)
            )(camera)
            aux = dict(
                loss_dict=jax.tree.map(jnp.mean, auxes["loss_dict"]),
                radii=jnp.max(auxes["radii"], axis=0),
                overflow_pairs=jnp.sum(auxes["overflow_pairs"]),
                overflow_tiles=jnp.sum(auxes["overflow_tiles"]),
                image=auxes["image"][0],
            )
            return jnp.mean(losses), aux
        return loss_fn(params, offset, active, camera)

    @jax.jit
    def step_fn(params, stats, opt_state, active, camera, step):
        offset = jnp.zeros((params.xyz.shape[0], 2), dtype=jnp.float32)
        (loss, aux), (grads, offset_grad) = jax.value_and_grad(
            batched_loss, argnums=(0, 1), has_aux=True
        )(params, offset, active, camera)
        stats = _update_stats(stats, aux["radii"], offset_grad, active)
        lr_tree = gaussian_lr_tree(opt_cfg, step, spatial_lr_scale)
        params, opt_state = adam_step(params, grads, opt_state, lr_tree)
        metrics = dict(loss=loss, **{f"loss/{k}": v for k, v in aux["loss_dict"].items()},
                       overflow_pairs=aux["overflow_pairs"],
                       overflow_tiles=aux["overflow_tiles"])
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
):
    """Build the jitted Stage-III train step.

    Extra args vs Stage I: the (non-differentiable) segment graph, and the
    consecutive-segment index pairs for the smoothness regularizer (constant
    between topology changes, recomputed host-side after each).
    """

    def loss_fn(params: HairParams, offset, graph, camera, smooth_pairs, smooth_valid):
        inputs = hair_render_inputs(params, graph, camera.cam_center,
                                    active_sh_degree, dist_to_scale_factor)
        extra = {}
        if use_smooth and opt_cfg.lambda_smooth > 0:
            extra["smooth"] = angle_smoothness_loss(
                params.endpoints, smooth_pairs, smooth_valid
            )
        return _render_and_loss(inputs, camera, graph.seg_active, offset, opt_cfg,
                                raster_cfg, width, height, extra_losses=extra)

    def batched_loss(params, offset, graph, camera, smooth_pairs, smooth_valid):
        if camera.world_view.ndim == 3:
            losses, auxes = jax.vmap(
                lambda cam: loss_fn(params, offset, graph, cam, smooth_pairs, smooth_valid)
            )(camera)
            aux = dict(
                loss_dict=jax.tree.map(jnp.mean, auxes["loss_dict"]),
                radii=jnp.max(auxes["radii"], axis=0),
                overflow_pairs=jnp.sum(auxes["overflow_pairs"]),
                overflow_tiles=jnp.sum(auxes["overflow_tiles"]),
                image=auxes["image"][0],
            )
            return jnp.mean(losses), aux
        return loss_fn(params, offset, graph, camera, smooth_pairs, smooth_valid)

    @jax.jit
    def step_fn(params, graph, stats, opt_state, camera, step, smooth_pairs, smooth_valid):
        offset = jnp.zeros((graph.endpoint_pairs.shape[0], 2), dtype=jnp.float32)
        (loss, aux), (grads, offset_grad) = jax.value_and_grad(
            batched_loss, argnums=(0, 1), has_aux=True
        )(params, offset, graph, camera, smooth_pairs, smooth_valid)
        stats = _update_stats(stats, aux["radii"], offset_grad, graph.seg_active)
        lr_tree = hair_lr_tree(opt_cfg, step, spatial_lr_scale)
        params, opt_state = adam_step(params, grads, opt_state, lr_tree)
        metrics = dict(loss=loss, **{f"loss/{k}": v for k, v in aux["loss_dict"].items()},
                       overflow_pairs=aux["overflow_pairs"],
                       overflow_tiles=aux["overflow_tiles"])
        return params, stats, opt_state, metrics, aux["image"]

    return step_fn
