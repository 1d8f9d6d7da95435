import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hairgs_tpu.config import OptimizationConfig
from hairgs_tpu.core.camera import make_camera, stack_cameras
from hairgs_tpu.models.gaussian import GaussianModel, gaussian_render_inputs
from hairgs_tpu.parallel.mesh import make_mesh, make_sharded_gaussian_step, shard_view_batch
from hairgs_tpu.render import render, RasterConfig
from hairgs_tpu.train import make_gaussian_train_step

W, H = 48, 40
CFG = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16)


def build_setup(n_views):
    rng = np.random.default_rng(3)
    n = 30
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, 0] = rng.uniform(-0.6, 0.6, n)
    pts[:, 1] = rng.uniform(-0.6, 0.6, n)
    pts[:, 2] = rng.uniform(2.5, 4.0, n)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    gt = GaussianModel(sh_degree=0, capacity_round=64)
    gt.create_from_pcd(pts, colors)
    cams = []
    for i in range(n_views):
        angle = 0.15 * i
        R = np.array([
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ])
        cam = make_camera(R, np.array([0, 0, 0.1 * i]), fovx=1.2, fovy=1.0)
        inputs = gaussian_render_inputs(gt.params, cam.cam_center, 0)
        img = render(cam, **inputs, active=gt.active, width=W, height=H,
                     config=CFG)["render"][..., :3]
        cams.append(cam._replace(image=img))
    model = GaussianModel(sh_degree=0, capacity_round=64)
    model.create_from_pcd(
        pts + rng.normal(0, 0.02, pts.shape).astype(np.float32), colors
    )
    opt = dataclasses.replace(OptimizationConfig(), lambda_mask=0.0,
                              lambda_orientation=0.0)
    model.training_setup(opt)
    return model, cams, opt


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8

    def test_sharded_step_runs(self):
        model, cams, opt = build_setup(8)
        mesh = make_mesh(8)
        step_fn = make_gaussian_train_step(opt, CFG, width=W, height=H,
                                           active_sh_degree=0)
        sharded = make_sharded_gaussian_step(step_fn, mesh)
        batch = stack_cameras(cams)
        params, stats, opt_state, metrics, _ = sharded(
            model.params, model.stats, model.opt_state, model.active, batch,
            jnp.asarray(1),
        )
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self):
        """The 8-way sharded step must produce the same update as the
        unsharded batched step (collectives are exact for f32 mean-of-8)."""
        model, cams, opt = build_setup(8)
        batch = stack_cameras(cams)
        step_fn = make_gaussian_train_step(opt, CFG, width=W, height=H,
                                           active_sh_degree=0)
        # the step donates its arena args: hand it copies so the originals
        # stay alive for the sharded call below
        copy = lambda t: jax.tree.map(jnp.array, t)
        p1, s1, o1, m1, _ = step_fn(
            copy(model.params), copy(model.stats), copy(model.opt_state),
            model.active, batch, jnp.asarray(1),
        )
        mesh = make_mesh(8)
        sharded = make_sharded_gaussian_step(step_fn, mesh)
        p2, s2, o2, m2, _ = sharded(
            model.params, model.stats, model.opt_state, model.active, batch,
            jnp.asarray(1),
        )
        # reduction order differs across shardings -> f32 noise only
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-3)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_shardmap_matches_gspmd(self):
        """The explicit-collective (shard_map + psum/pmean/pmax) step must
        produce the same update as the GSPMD-annotated path."""
        from hairgs_tpu.parallel.mesh import make_shardmap_gaussian_step

        model, cams, opt = build_setup(8)
        batch = stack_cameras(cams)
        mesh = make_mesh(8)
        step_fn = make_gaussian_train_step(opt, CFG, width=W, height=H,
                                           active_sh_degree=0)
        gspmd = make_sharded_gaussian_step(step_fn, mesh)
        copy = lambda t: jax.tree.map(jnp.array, t)  # step donates its arenas
        p1, s1, o1, m1, _ = gspmd(
            copy(model.params), copy(model.stats), copy(model.opt_state),
            model.active, batch, jnp.asarray(1),
        )
        explicit = make_shardmap_gaussian_step(
            opt, CFG, width=W, height=H, active_sh_degree=0, mesh=mesh)
        p2, s2, o2, m2, imgs = explicit(
            model.params, model.stats, model.opt_state, model.active, batch,
            jnp.asarray(1),
        )
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-3)
        assert int(m1["overflow_pairs"]) == int(m2["overflow_pairs"])
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        assert imgs.shape[0] == 8  # one local first-view image per device

    def test_shardmap_hair_matches_gspmd(self):
        """Explicit-collective hair step vs the GSPMD-annotated hair step."""
        import __graft_entry__ as ge
        from hairgs_tpu.parallel.mesh import (
            make_sharded_hair_step,
            make_shardmap_hair_step,
        )
        from hairgs_tpu.core.camera import stack_cameras as stack
        from hairgs_tpu.train import make_hair_train_step

        model, opt, camera_at, (sp, sv), (w, h) = ge._tiny_hair_setup()
        cams = [camera_at(0.8 * i) for i in range(8)]
        batch = stack(cams)
        cfg = RasterConfig(max_tiles_per_gaussian=8, max_pairs_per_tile=128,
                           chunk=32)
        mesh = make_mesh(8)
        step_fn = make_hair_train_step(
            opt, cfg, width=w, height=h, active_sh_degree=0,
            spatial_lr_scale=model.spatial_lr_scale,
            dist_to_scale_factor=model.dist_to_scale_factor)
        gspmd = make_sharded_hair_step(step_fn, mesh)
        copy = lambda t: jax.tree.map(jnp.array, t)
        p1, s1, o1, m1, _ = gspmd(
            copy(model.params), model.graph, copy(model.stats),
            copy(model.opt_state), batch, jnp.asarray(1), sp, sv)
        explicit = make_shardmap_hair_step(
            opt, cfg, width=w, height=h, active_sh_degree=0,
            spatial_lr_scale=model.spatial_lr_scale,
            dist_to_scale_factor=model.dist_to_scale_factor, mesh=mesh)
        p2, s2, o2, m2, _ = explicit(
            model.params, model.graph, model.stats, model.opt_state, batch,
            jnp.asarray(1), sp, sv)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-3)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_batch_actually_sharded(self):
        mesh = make_mesh(8)
        model, cams, opt = build_setup(8)
        batch = shard_view_batch(stack_cameras(cams), mesh)
        sharding = batch.image.sharding
        assert sharding.num_devices == 8
        # leading axis split across devices
        shard_shape = sharding.shard_shape(batch.image.shape)
        assert shard_shape[0] == 1
