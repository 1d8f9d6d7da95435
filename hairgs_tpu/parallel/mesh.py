"""Device-mesh data parallelism over camera views.

The reference is single-process single-GPU with no distributed execution of
any kind (utils/general.py:116 pins cuda:0; no NCCL/MPI anywhere — SURVEY
§2.3/§5.8). On TPU the natural parallelism of multi-view splatting is data
parallelism over views: each chip renders + differentiates its own camera
minibatch slice against the replicated model, and the gradient mean over the
batch axis becomes an all-reduce over ICI that XLA inserts automatically from
the sharding annotations.

Axes:
- "data": view minibatch axis (primary; scales to pod slices over DCN too)
- a "gauss" model-axis sharding of the N-Gaussian dimension is the documented
  scale-out option for preprocess once scene sizes outgrow one chip's HBM;
  hair scenes (<=1e6 primitives) fit comfortably, so the model is replicated.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_view_mesh(view_batch: int, max_devices: int = 0) -> Optional[Mesh]:
    """Mesh for the train driver's view-batch DP, or None when one device
    suffices. Uses the largest device count <= min(local devices, view_batch)
    that divides view_batch (even shards keep shapes static under jit).

    max_devices: optional cap on the mesh size; 0 (default) means
    "all local devices"."""
    if view_batch <= 1:
        return None
    n = min(len(jax.devices()), view_batch)
    if max_devices > 0:
        n = min(n, max_devices)
    while view_batch % n:
        n -= 1
    if n <= 1:
        return None
    return make_mesh(n)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_view_batch(camera_batch, mesh: Mesh, axis_name: str = "data"):
    """Shard a batched Camera pytree along its leading (view) axis."""

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(axis_name)))

    return jax.tree.map(put, camera_batch)


def make_sharded_gaussian_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (batched-camera) train step with mesh shardings.

    Model state is replicated; the camera batch is sharded over `axis_name`.
    The mean over views inside the step lowers to a psum over ICI.
    """
    repl = NamedSharding(mesh, P())

    def wrapped(params, stats, opt_state, active, camera_batch, step):
        params = jax.device_put(params, repl)
        stats = jax.device_put(stats, repl)
        opt_state = jax.device_put(opt_state, repl)
        active = jax.device_put(active, repl)
        camera_batch = shard_view_batch(camera_batch, mesh, axis_name)
        return step_fn(params, stats, opt_state, active, camera_batch, step)

    return wrapped


def make_shardmap_gaussian_step(
    opt_cfg,
    raster_cfg,
    *,
    width: int,
    height: int,
    active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Explicit-collective (shard_map + psum/pmean/pmax) Stage-I DP step.

    Same semantics as make_gaussian_train_step wrapped by
    make_sharded_gaussian_step — but instead of GSPMD inferring the
    all-reduce from sharding annotations, each device runs the per-view
    pipeline on its local camera shard and the gradient mean / stat
    reductions are written as explicit collectives over ICI. Useful as (a)
    the multi-host template (shard cameras per host, one mesh over
    jax.devices() spanning DCN) and (b) a parity oracle for the GSPMD path.

    step_fn(params, stats, opt_state, active, camera_batch, step): the
    camera batch's leading axis must divide the mesh axis size. Returns
    (params, stats, opt_state, metrics, images) with images stacked one per
    device (the GSPMD wrapper returns one image; use images[0]).
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    from hairgs_tpu.models.gaussian import (
        GaussianStats,
        gaussian_render_inputs,
    )
    from hairgs_tpu.optim import adam_step
    from hairgs_tpu.train.trainer import (
        _update_stats,
        gaussian_lr_tree,
        render_loss_and_grads,
    )

    def local_step(params, stats, opt_state, active, camera, step):
        def one_view(cam):
            return render_loss_and_grads(
                lambda p: gaussian_render_inputs(p, cam.cam_center,
                                                 active_sh_degree),
                params, cam, active, opt_cfg, raster_cfg, width, height,
            )

        losses, grads, offset_grads, auxes = jax.vmap(one_view)(camera)
        # gradient mean over the GLOBAL view batch = local mean, pmean'd
        loss = jax.lax.pmean(jnp.mean(losses), axis_name)
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(jnp.mean(g, axis=0), axis_name), grads
        )
        loss_dict = jax.tree.map(
            lambda x: jax.lax.pmean(jnp.mean(x), axis_name),
            auxes["loss_dict"],
        )

        # densification stats: local per-view accumulation, then max/sum
        # across devices (all associative, so K sharded views accumulate
        # exactly like K reference iterations)
        zero = GaussianStats(
            max_radii2d=jnp.zeros_like(stats.max_radii2d),
            xyz_grad_accum=jnp.zeros_like(stats.xyz_grad_accum),
            denom=jnp.zeros_like(stats.denom),
        )
        local = _update_stats(zero, auxes["radii"], offset_grads, active)
        stats = GaussianStats(
            max_radii2d=jnp.maximum(
                stats.max_radii2d,
                jax.lax.pmax(local.max_radii2d, axis_name),
            ),
            xyz_grad_accum=stats.xyz_grad_accum
            + jax.lax.psum(local.xyz_grad_accum, axis_name),
            denom=stats.denom + jax.lax.psum(local.denom, axis_name),
        )

        lr_tree = gaussian_lr_tree(opt_cfg, step, spatial_lr_scale)
        params, opt_state = adam_step(params, grads, opt_state, lr_tree)
        train_psnr = loss_dict.pop("psnr")
        metrics = dict(
            loss=loss,
            psnr=train_psnr,
            **{f"loss/{k}": v for k, v in loss_dict.items()},
            overflow_pairs=jax.lax.psum(
                jnp.sum(auxes["overflow_pairs"]), axis_name),
            overflow_tiles=jax.lax.psum(
                jnp.sum(auxes["overflow_tiles"]), axis_name),
            overflow_capacity=jax.lax.psum(
                jnp.sum(auxes["overflow_capacity"]), axis_name),
            pairs_demand=jax.lax.pmax(
                jnp.max(auxes["pairs_demand"]), axis_name),
        )
        return params, stats, opt_state, metrics, auxes["image"][:1]

    repl = PartitionSpec()
    data = PartitionSpec(axis_name)
    # check_vma=False: the compositor's scan carries start device-invariant
    # and become varying mid-scan, which the vma tracker rejects; the
    # replicated out_specs are validated by the parity test instead
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(repl, repl, repl, repl, data, repl),
        out_specs=(repl, repl, repl, repl, data),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_shardmap_hair_step(
    opt_cfg,
    raster_cfg,
    *,
    width: int,
    height: int,
    active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
    dist_to_scale_factor: float,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Explicit-collective Stage-III (hair) DP step — the strand-model twin
    of make_shardmap_gaussian_step. Render/photometric gradients are local
    per view and pmean'd; the smoothness regularizer acts on the replicated
    endpoints, so it is computed once per device (device-invariant) and
    added AFTER the collective.

    step_fn(params, graph, stats, opt_state, camera_batch, step,
    smooth_pairs, smooth_valid) -> (params, stats, opt_state, metrics,
    images-one-per-device)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    from hairgs_tpu.losses.strand import angle_smoothness_loss
    from hairgs_tpu.models.gaussian import GaussianStats
    from hairgs_tpu.models.hair import hair_render_inputs
    from hairgs_tpu.optim import adam_step
    from hairgs_tpu.train.trainer import (
        _tree_add,
        _update_stats,
        hair_lr_tree,
        render_loss_and_grads,
    )

    def local_step(params, graph, stats, opt_state, camera, step,
                   smooth_pairs, smooth_valid):
        def one_view(cam):
            return render_loss_and_grads(
                lambda p: hair_render_inputs(
                    p, graph, cam.cam_center, active_sh_degree,
                    dist_to_scale_factor),
                params, cam, graph.seg_active, opt_cfg, raster_cfg,
                width, height,
            )

        losses, grads, offset_grads, auxes = jax.vmap(one_view)(camera)
        loss = jax.lax.pmean(jnp.mean(losses), axis_name)
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(jnp.mean(g, axis=0), axis_name), grads
        )
        loss_dict = jax.tree.map(
            lambda x: jax.lax.pmean(jnp.mean(x), axis_name),
            auxes["loss_dict"],
        )

        if opt_cfg.lambda_smooth > 0:
            def smooth_fn(p):
                return opt_cfg.lambda_smooth * angle_smoothness_loss(
                    p.endpoints, smooth_pairs, smooth_valid)

            smooth_loss, smooth_grads = jax.value_and_grad(smooth_fn)(params)
            loss = loss + smooth_loss
            grads = _tree_add(grads, smooth_grads)
            loss_dict = dict(loss_dict,
                             smooth=smooth_loss / opt_cfg.lambda_smooth)

        zero = GaussianStats(
            max_radii2d=jnp.zeros_like(stats.max_radii2d),
            xyz_grad_accum=jnp.zeros_like(stats.xyz_grad_accum),
            denom=jnp.zeros_like(stats.denom),
        )
        local = _update_stats(zero, auxes["radii"], offset_grads,
                              graph.seg_active)
        stats = GaussianStats(
            max_radii2d=jnp.maximum(
                stats.max_radii2d,
                jax.lax.pmax(local.max_radii2d, axis_name)),
            xyz_grad_accum=stats.xyz_grad_accum
            + jax.lax.psum(local.xyz_grad_accum, axis_name),
            denom=stats.denom + jax.lax.psum(local.denom, axis_name),
        )

        lr_tree = hair_lr_tree(opt_cfg, step, spatial_lr_scale)
        params, opt_state = adam_step(params, grads, opt_state, lr_tree)
        train_psnr = loss_dict.pop("psnr")
        metrics = dict(
            loss=loss,
            psnr=train_psnr,
            **{f"loss/{k}": v for k, v in loss_dict.items()},
            overflow_pairs=jax.lax.psum(
                jnp.sum(auxes["overflow_pairs"]), axis_name),
            overflow_tiles=jax.lax.psum(
                jnp.sum(auxes["overflow_tiles"]), axis_name),
            overflow_capacity=jax.lax.psum(
                jnp.sum(auxes["overflow_capacity"]), axis_name),
            pairs_demand=jax.lax.pmax(
                jnp.max(auxes["pairs_demand"]), axis_name),
        )
        return params, stats, opt_state, metrics, auxes["image"][:1]

    repl = PartitionSpec()
    data = PartitionSpec(axis_name)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(repl, repl, repl, repl, data, repl, repl, repl),
        out_specs=(repl, repl, repl, repl, data),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_hair_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    repl = NamedSharding(mesh, P())

    def wrapped(params, graph, stats, opt_state, camera_batch, step,
                smooth_pairs, smooth_valid, magnet_idx=None):
        params = jax.device_put(params, repl)
        graph = jax.device_put(graph, repl)
        stats = jax.device_put(stats, repl)
        opt_state = jax.device_put(opt_state, repl)
        smooth_pairs = jax.device_put(smooth_pairs, repl)
        smooth_valid = jax.device_put(smooth_valid, repl)
        if magnet_idx is not None:
            magnet_idx = jax.device_put(magnet_idx, repl)
        camera_batch = shard_view_batch(camera_batch, mesh, axis_name)
        return step_fn(params, graph, stats, opt_state, camera_batch, step,
                       smooth_pairs, smooth_valid, magnet_idx=magnet_idx)

    return wrapped
