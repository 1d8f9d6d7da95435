"""Depth-slab Gaussian-axis sharding (SURVEY §2.3 "spatial sharding").

Scale-out path for scenes whose pair tables / arenas outgrow one chip's HBM
(the reference has no analogue — it is single-GPU by construction,
utils/general.py:116). Design (docs/ROADMAP.md §6):

- Per camera, partition the N-Gaussian axis into k contiguous *depth slabs*
  (front-to-back) by sorting on view-space z. Contiguity in depth is what
  makes per-slab compositing order-correct: every Gaussian in slab i is in
  front of every Gaussian in slab i+1, so the per-tile depth-sorted order of
  the full render is exactly the concatenation of the slabs' orders.
- Each device composites ONLY its slab with the ordinary renderer, producing
  a partial (color, transmittance) image — an alpha-compositing *segment*.
- Segments compose associatively: (c1,T1) ∘ (c2,T2) = (c1 + T1·c2, T1·T2).
  The k partials are folded front-to-back over the mesh axis (an all_gather
  of k small images over ICI followed by a k-step fold; k ≤ 8 so a log-depth
  ppermute scan buys nothing).

Memory economics: each device holds N/k Gaussians' pair tables and paged
binning buffers — the dominant allocation — while the merged image costs
k·H·W·(C+1) floats once. Resharding (the depth sort) is a per-camera
gather, fused by XLA.

Differentiable end-to-end: the slab permutation is an integer gather, the
per-slab render carries its own custom VJP, and the fold is plain jnp.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hairgs_tpu.render.renderer import RasterConfig, render


def _depth_slab_permutation(means3d, active, world_view):
    """Front-to-back permutation of the Gaussian axis by view-space z.

    Inactive rows sort to the back (+inf key) so they pad the last slab.
    Returns (perm, inv_perm): gather indices such that x[perm] is
    depth-ordered and y[inv_perm] undoes it.
    """
    depth = means3d @ world_view[2, :3] + world_view[2, 3]
    key = jnp.where(active, depth, jnp.inf) if active is not None else depth
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)
    return perm, inv_perm


def compose_segments(images, final_ts):
    """Fold k alpha-compositing segments front-to-back.

    images: (k,H,W,C) partial colors; final_ts: (k,H,W) partial
    transmittances. Returns (merged (H,W,C), T (H,W)).
    """

    def step(carry, seg):
        c, t = carry
        ci, ti = seg
        return (c + t[..., None] * ci, t * ti), None

    init = (jnp.zeros_like(images[0]), jnp.ones_like(final_ts[0]))
    (color, t), _ = jax.lax.scan(step, init, (images, final_ts))
    return color, t


def render_gauss_sharded(
    camera,
    *,
    means3d: jnp.ndarray,
    opacity: jnp.ndarray,
    features: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    width: int,
    height: int,
    config: RasterConfig = RasterConfig(),
    mesh: Mesh,
    axis_name: str = "gauss",
):
    """Depth-slab sharded version of render(): same signature surface, same
    output dict, Gaussian axis split over `mesh[axis_name]`.

    Per-slab capacities (max_pairs_per_tile etc.) apply to each slab
    independently, so the aggregate pair capacity scales with the mesh.
    """
    k = mesh.shape[axis_name]
    n = means3d.shape[0]
    assert n % k == 0, (
        f"Gaussian capacity {n} must divide the {axis_name} axis size {k} "
        f"(capacity_round should be a multiple of the mesh size)"
    )
    if active is None:
        active = jnp.ones((n,), bool)

    perm, inv_perm = _depth_slab_permutation(means3d, active, camera.world_view)

    def g(x):
        return None if x is None else x[perm]

    cam_light = camera._replace(image=None, mask=None, orientation=None,
                                confidence=None)

    def slab(cam, m3, opa, feat, sc, rot, act, off):
        out = render(
            cam, means3d=m3, opacity=opa, features=feat, scales=sc,
            rotations=rot, active=act, mean2d_offset=off, bg=None,
            width=width, height=height, config=config,
        )
        return (
            out["render"][None],
            out["render_photo"][None],
            out["final_T"][None],
            out["radii"],
            jnp.reshape(out["overflow_pairs"], (1,)),
            jnp.reshape(out["overflow_tiles"], (1,)),
            jnp.reshape(out["overflow_capacity"], (1,)),
            jnp.reshape(out["pairs_demand"], (1,)),
        )

    spec_g = P(axis_name)
    sharded_slab = jax.shard_map(
        slab,
        mesh=mesh,
        in_specs=(P(), spec_g, spec_g, spec_g, spec_g, spec_g, spec_g,
                  None if mean2d_offset is None else spec_g),
        out_specs=(spec_g, spec_g, spec_g, spec_g, spec_g, spec_g, spec_g,
                   spec_g),
        check_vma=False,
    )
    (imgs, imgs_photo, ts, radii_p, opairs, otiles, ocap,
     demand) = sharded_slab(
        cam_light, g(means3d), g(opacity), g(features), g(scales),
        g(rotations), g(active), g(mean2d_offset),
    )

    image, final_t = compose_segments(imgs, ts)
    image_photo, _ = compose_segments(imgs_photo, ts)
    if bg is not None:
        image = image + final_t[..., None] * bg
        image_photo = image_photo + final_t[..., None] * bg

    radii = radii_p[inv_perm]
    return {
        "render": image,
        "render_photo": image_photo,
        "final_T": final_t,
        "radii": radii,
        "visibility_filter": radii > 0,
        "overflow_pairs": jnp.sum(opairs),
        "overflow_tiles": jnp.sum(otiles),
        "overflow_capacity": jnp.sum(ocap),
        # per-slab tables are sized independently; capacity must cover the
        # largest slab's demand
        "pairs_demand": jnp.max(demand),
    }


def gauss_mesh(num_devices: Optional[int] = None) -> Mesh:
    """Mesh with a single "gauss" model axis (composable with a "data" view
    axis by reshaping jax.devices() into a 2D mesh when both are wanted)."""
    import numpy as np

    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("gauss",))


def make_2d_mesh(data_size: int, gauss_size: int,
                 data_axis: str = "data", gauss_axis: str = "gauss",
                 devices=None) -> Mesh:
    """(data × gauss) mesh for view-DP composed with depth-slab sharding.

    DCN-aware on multi-slice topologies (pods / multi-host): the data axis
    is laid out ACROSS slices and the gauss axis WITHIN each slice, so the
    per-step collectives match the link hierarchy — the slab fold's
    image-segment all-gathers and the per-slab gradient reductions ride ICI
    every step, while only the view-mean gradient all-reduce (one
    model-sized psum per step) crosses DCN. This is the standard
    "DP outermost over DCN" recipe; on a single slice (or the CPU test
    mesh) it reduces to a row-major reshape of the local devices.
    """
    import numpy as np

    if devices is None:
        devices = jax.devices()
    need = data_size * gauss_size
    assert len(devices) >= need, (
        f"need {need} devices for a {data_size}x{gauss_size} mesh, "
        f"have {len(devices)}"
    )
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        # per-slice (ICI) shape x across-slice (DCN) shape; elementwise
        # product is the final mesh shape
        dm = mesh_utils.create_hybrid_device_mesh(
            (1, gauss_size), (data_size, 1), devices=devices)
        return Mesh(dm, (data_axis, gauss_axis))
    return Mesh(np.asarray(devices[:need]).reshape(data_size, gauss_size),
                (data_axis, gauss_axis))


def make_slab_render(axis_name: str, num_slabs: int):
    """render()-compatible function that renders only the caller device's
    depth slab and composes the partials over `axis_name` — for use INSIDE a
    shard_map body (uses lax.axis_index / all_gather).

    Differentiable: slab selection is permute_rows (gather-based VJP) + a
    dynamic slice, so no TPU scatters appear in the backward; the all_gather
    of partial images transposes to a psum_scatter. NOTE the k-fold seed
    duplication: every gauss rank computes the identical composed loss, so
    cotangents arriving through the all_gather transpose are summed k times —
    callers must pmean (not psum) gradients over `axis_name` (the pmean's
    1/k cancels the duplication while the sum merges the disjoint slabs).
    """
    from hairgs_tpu.render.binning import permute_rows
    from hairgs_tpu.render.renderer import RasterConfig

    def slab_render(camera, *, means3d, opacity, features, scales=None,
                    rotations=None, cov3d_precomp=None, bg=None, active=None,
                    mean2d_offset=None, scale_modifier=1.0, width, height,
                    config: RasterConfig = RasterConfig()):
        n = means3d.shape[0]
        k = num_slabs
        assert n % k == 0, f"capacity {n} must divide num_slabs {k}"
        n_local = n // k
        assert cov3d_precomp is None, "slab render: pass scales/rotations"
        if active is None:
            active = jnp.ones((n,), bool)
        perm, inv_perm = _depth_slab_permutation(means3d, active,
                                                 camera.world_view)
        idx = jax.lax.axis_index(axis_name)
        start = idx * n_local

        def take(x):
            if x is None:
                return None
            flat = x.ndim == 1
            rows = x[:, None] if flat else x
            if rows.dtype == jnp.bool_:
                rows = rows[perm]  # non-differentiable mask: plain gather
            else:
                rows = permute_rows(rows, perm, inv_perm)
            rows = jax.lax.dynamic_slice_in_dim(rows, start, n_local)
            return rows[:, 0] if flat else rows

        out = render(
            camera, means3d=take(means3d), opacity=take(opacity),
            features=take(features), scales=take(scales),
            rotations=take(rotations), bg=None, active=take(active),
            mean2d_offset=take(mean2d_offset),
            scale_modifier=scale_modifier,
            width=width, height=height, config=config,
        )
        imgs = jax.lax.all_gather(out["render"], axis_name)
        imgs_photo = jax.lax.all_gather(out["render_photo"], axis_name)
        ts = jax.lax.all_gather(out["final_T"], axis_name)
        image, final_t = compose_segments(imgs, ts)
        image_photo, _ = compose_segments(imgs_photo, ts)
        if bg is not None:
            image = image + final_t[..., None] * bg
            image_photo = image_photo + final_t[..., None] * bg
        # radii back to full model order, identical on every gauss rank
        radii = jax.lax.all_gather(out["radii"], axis_name).reshape(n)[inv_perm]
        return {
            "render": image,
            "render_photo": image_photo,
            "final_T": final_t,
            "radii": radii,
            "visibility_filter": radii > 0,
            "overflow_pairs": out["overflow_pairs"],
            "overflow_tiles": out["overflow_tiles"],
            "overflow_capacity": out["overflow_capacity"],
            "pairs_demand": out["pairs_demand"],
        }

    return slab_render


def make_slab_train_step(
    model_kind: str,
    opt_cfg,
    raster_cfg,
    *,
    width: int,
    height: int,
    active_sh_degree: int,
    spatial_lr_scale: float = 1.0,
    dist_to_scale_factor: Optional[float] = None,
    mesh: Mesh,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
):
    """Train step with the Gaussian axis depth-slab sharded over
    `mesh[gauss_axis]`, composed with view-DP over `mesh[data_axis]`.

    The driver-facing twin of trainer.make_*_train_step for scenes whose pair
    tables outgrow one chip (SURVEY §2.3 spatial sharding): per-slab raster
    capacities (max_pairs_per_tile etc.) apply to each slab independently, so
    aggregate capacity scales with the gauss axis while view throughput
    scales with the data axis.

    model_kind: "gaussian" -> step(params, stats, opt_state, active, camera,
    step); "hair" -> step(params, graph, stats, opt_state, camera, step,
    smooth_pairs, smooth_valid, magnet_idx=None). The camera batch must be
    batched with leading axis divisible by the data-axis size.
    """
    import functools

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    from hairgs_tpu.losses.strand import angle_smoothness_loss
    from hairgs_tpu.models.gaussian import GaussianStats, gaussian_render_inputs
    from hairgs_tpu.models.hair import hair_render_inputs
    from hairgs_tpu.optim import adam_step
    from hairgs_tpu.train.trainer import (
        _tree_add,
        _update_stats,
        gaussian_lr_tree,
        hair_lr_tree,
        render_loss_and_grads,
    )

    k = mesh.shape[gauss_axis]
    render_fn = make_slab_render(gauss_axis, k)
    is_hair = model_kind == "hair"

    def local_step(params, graph, stats, opt_state, active, camera, step,
                   smooth_pairs, smooth_valid, magnet_idx):
        def one_view(cam):
            if is_hair:
                inputs_fn = lambda p: hair_render_inputs(  # noqa: E731
                    p, graph, cam.cam_center, active_sh_degree,
                    dist_to_scale_factor)
            else:
                inputs_fn = lambda p: gaussian_render_inputs(  # noqa: E731
                    p, cam.cam_center, active_sh_degree)
            return render_loss_and_grads(
                inputs_fn, params, cam, active, opt_cfg, raster_cfg,
                width, height, render_fn=render_fn,
            )

        # unrolled local-view loop (NOT vmap: the slab render's all_gather /
        # psum_scatter pair has no usable batching rule under transpose on
        # this jax version; the local batch is 1-2 views, so unrolling is
        # cheap and XLA still overlaps the programs)
        b_local = camera.world_view.shape[0]
        per_view = [
            one_view(jax.tree.map(lambda x: x[i], camera))
            for i in range(b_local)
        ]
        losses = jnp.stack([r[0] for r in per_view])
        grads = jax.tree.map(
            lambda *g: jnp.stack(g), *[r[1] for r in per_view])
        offset_grads = jnp.stack([r[2] for r in per_view])
        auxes = jax.tree.map(
            lambda *a: jnp.stack(a), *[r[3] for r in per_view])
        # pmean over gauss: 1/k cancels the k-fold cotangent duplication
        # (see make_slab_render) while the sum merges the disjoint slabs
        merge = lambda g: jax.lax.pmean(  # noqa: E731
            jax.lax.pmean(jnp.mean(g, axis=0), gauss_axis), data_axis)
        loss = jax.lax.pmean(jnp.mean(losses), data_axis)
        grads = jax.tree.map(merge, grads)
        offset_grads = jax.lax.pmean(offset_grads, gauss_axis)
        loss_dict = jax.tree.map(
            lambda x: jax.lax.pmean(jnp.mean(x), data_axis),
            auxes["loss_dict"],
        )

        # endpoint regularizers act on the replicated params: computed once
        # per device AFTER the collectives (device-invariant, no reduction)
        if is_hair and opt_cfg.lambda_smooth > 0:
            def smooth_fn(p):
                return opt_cfg.lambda_smooth * angle_smoothness_loss(
                    p.endpoints, smooth_pairs, smooth_valid)

            smooth_loss, smooth_grads = jax.value_and_grad(smooth_fn)(params)
            loss = loss + smooth_loss
            grads = _tree_add(grads, smooth_grads)
            loss_dict = dict(loss_dict,
                             smooth=smooth_loss / opt_cfg.lambda_smooth)
        if is_hair and opt_cfg.lambda_magnet > 0 and magnet_idx is not None:
            from hairgs_tpu.losses.strand import strand_joints_magnet_loss

            m_ids, m_comp, m_valid = magnet_idx

            def magnet_fn(p):
                return opt_cfg.lambda_magnet * strand_joints_magnet_loss(
                    p.endpoints, m_ids, m_comp, m_valid)

            magnet_loss, magnet_grads = jax.value_and_grad(magnet_fn)(params)
            loss = loss + magnet_loss
            grads = _tree_add(grads, magnet_grads)
            loss_dict = dict(loss_dict,
                             magnet=magnet_loss / opt_cfg.lambda_magnet)

        # densification stats: radii/offset grads are full-size and gauss-
        # invariant after the merges above, so reduce over the data axis only
        zero = GaussianStats(
            max_radii2d=jnp.zeros_like(stats.max_radii2d),
            xyz_grad_accum=jnp.zeros_like(stats.xyz_grad_accum),
            denom=jnp.zeros_like(stats.denom),
        )
        local = _update_stats(zero, auxes["radii"], offset_grads, active)
        stats = GaussianStats(
            max_radii2d=jnp.maximum(
                stats.max_radii2d,
                jax.lax.pmax(local.max_radii2d, data_axis)),
            xyz_grad_accum=stats.xyz_grad_accum
            + jax.lax.psum(local.xyz_grad_accum, data_axis),
            denom=stats.denom + jax.lax.psum(local.denom, data_axis),
        )

        lr_fn = hair_lr_tree if is_hair else gaussian_lr_tree
        lr_tree = lr_fn(opt_cfg, step, spatial_lr_scale)
        params, opt_state = adam_step(params, grads, opt_state, lr_tree)
        train_psnr = loss_dict.pop("psnr")
        metrics = dict(
            loss=loss,
            psnr=train_psnr,
            **{f"loss/{kk}": v for kk, v in loss_dict.items()},
            overflow_pairs=jax.lax.psum(
                jnp.sum(auxes["overflow_pairs"]), (data_axis, gauss_axis)),
            overflow_tiles=jax.lax.psum(
                jnp.sum(auxes["overflow_tiles"]), (data_axis, gauss_axis)),
        )
        return params, stats, opt_state, metrics, auxes["image"][:1]

    repl = PartitionSpec()
    data = PartitionSpec(data_axis)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(repl,) * 5 + (data, repl, repl, repl, repl),
        out_specs=(repl, repl, repl, repl, data),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    if is_hair:
        def step_fn(params, graph, stats, opt_state, camera, step,
                    smooth_pairs, smooth_valid, magnet_idx=None):
            p, s, o, m, img = jitted(
                params, graph, stats, opt_state, graph.seg_active, camera,
                step, smooth_pairs, smooth_valid, magnet_idx)
            return p, s, o, m, img[0]
    else:
        def step_fn(params, stats, opt_state, active, camera, step):
            p, s, o, m, img = jitted(params, None, stats, opt_state, active,
                                     camera, step, None, None, None)
            return p, s, o, m, img[0]

    return step_fn
