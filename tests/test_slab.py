"""Depth-slab Gaussian-axis sharding parity (docs/ROADMAP.md §6, SURVEY §2.3).

The sharded renderer splits the Gaussian axis into k contiguous depth slabs,
composites each slab on its own device, and folds the partial (color, T)
segments front-to-back. These tests assert exact-order parity with the
replicated renderer on an 8-virtual-device CPU mesh — forward image, final
transmittance, radii routing, and gradients through the fold."""

import numpy as np
import jax
import jax.numpy as jnp

from hairgs_tpu.core.camera import make_camera
from hairgs_tpu.models.gaussian import GaussianModel, gaussian_render_inputs
from hairgs_tpu.parallel.slab import (
    compose_segments,
    gauss_mesh,
    render_gauss_sharded,
)
from hairgs_tpu.render import RasterConfig, render

W, H = 48, 40
CFG = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=256, chunk=16)


def build_scene(n=96, seed=5):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, 0] = rng.uniform(-0.6, 0.6, n)
    pts[:, 1] = rng.uniform(-0.6, 0.6, n)
    pts[:, 2] = rng.uniform(2.5, 4.0, n)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    model = GaussianModel(sh_degree=0, capacity_round=n)
    model.create_from_pcd(pts, colors)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 0.1]), fovx=1.2, fovy=1.0)
    return model, cam


class TestComposeSegments:
    def test_two_segment_identity(self):
        rng = np.random.default_rng(0)
        c = jnp.asarray(rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0.2, 1, (2, 4, 4)).astype(np.float32))
        color, trans = compose_segments(c, t)
        np.testing.assert_allclose(
            color, c[0] + t[0][..., None] * c[1], rtol=1e-6)
        np.testing.assert_allclose(trans, t[0] * t[1], rtol=1e-6)

    def test_associativity(self):
        rng = np.random.default_rng(1)
        c = jnp.asarray(rng.uniform(0, 1, (8, 4, 4, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0.2, 1, (8, 4, 4)).astype(np.float32))
        color_a, t_a = compose_segments(c, t)
        # fold two halves then compose the halves
        ch1, th1 = compose_segments(c[:4], t[:4])
        ch2, th2 = compose_segments(c[4:], t[4:])
        color_b = ch1 + th1[..., None] * ch2
        np.testing.assert_allclose(color_a, color_b, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(t_a, th1 * th2, rtol=1e-5, atol=1e-6)


class TestSlabParity:
    def test_forward_matches_replicated(self):
        model, cam = build_scene()
        mesh = gauss_mesh(8)
        inputs = gaussian_render_inputs(model.params, cam.cam_center, 0)
        bg = jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0, 0.0, 0.0])
        ref = render(cam, **inputs, active=model.active, bg=bg,
                     width=W, height=H, config=CFG)
        out = render_gauss_sharded(
            cam, **inputs, active=model.active, bg=bg,
            width=W, height=H, config=CFG, mesh=mesh)
        np.testing.assert_allclose(out["render"], ref["render"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out["final_T"], ref["final_T"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(out["radii"], ref["radii"])
        np.testing.assert_array_equal(out["visibility_filter"],
                                      ref["visibility_filter"])
        assert int(out["overflow_pairs"]) == 0

    def test_forward_matches_with_inactive_rows(self):
        model, cam = build_scene(n=96)
        # deactivate a scattered subset: they must pad the last slab
        active = np.asarray(model.active).copy()
        active[::5] = False
        active = jnp.asarray(active)
        mesh = gauss_mesh(8)
        inputs = gaussian_render_inputs(model.params, cam.cam_center, 0)
        ref = render(cam, **inputs, active=active, width=W, height=H,
                     config=CFG)
        out = render_gauss_sharded(cam, **inputs, active=active,
                                   width=W, height=H, config=CFG, mesh=mesh)
        np.testing.assert_allclose(out["render"], ref["render"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(out["radii"], ref["radii"])

    def test_gradients_match_replicated(self):
        model, cam = build_scene(n=64)
        mesh = gauss_mesh(8)
        target = jnp.asarray(
            np.random.default_rng(7).uniform(0, 1, (H, W, 7)).astype(np.float32))

        def loss_rep(params):
            inputs = gaussian_render_inputs(params, cam.cam_center, 0)
            img = render(cam, **inputs, active=model.active, width=W,
                         height=H, config=CFG)["render"]
            return jnp.mean((img - target) ** 2)

        def loss_slab(params):
            inputs = gaussian_render_inputs(params, cam.cam_center, 0)
            img = render_gauss_sharded(
                cam, **inputs, active=model.active, width=W, height=H,
                config=CFG, mesh=mesh)["render"]
            return jnp.mean((img - target) ** 2)

        g_rep = jax.grad(loss_rep)(model.params)
        g_slab = jax.grad(loss_slab)(model.params)
        for a, b in zip(jax.tree.leaves(g_rep), jax.tree.leaves(g_slab)):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-6)

    def test_jit_compiles(self):
        model, cam = build_scene(n=64)
        mesh = gauss_mesh(8)

        @jax.jit
        def f(params):
            inputs = gaussian_render_inputs(params, cam.cam_center, 0)
            return render_gauss_sharded(
                cam, **inputs, active=model.active, width=W, height=H,
                config=CFG, mesh=mesh)["render"]

        img = f(model.params)
        assert img.shape == (H, W, 7)
        assert bool(jnp.all(jnp.isfinite(img)))


class TestSlabTrainStep:
    """The full train step with --gauss_shard semantics: (data x gauss) 2D
    mesh, view-DP over data, depth slabs over gauss — must produce the same
    update as the unsharded batched trainer step."""

    def _gaussian_setup(self, n_views):
        import dataclasses

        from hairgs_tpu.config import OptimizationConfig

        rng = np.random.default_rng(3)
        n = 64
        pts = np.zeros((n, 3), dtype=np.float32)
        pts[:, 0] = rng.uniform(-0.6, 0.6, n)
        pts[:, 1] = rng.uniform(-0.6, 0.6, n)
        pts[:, 2] = rng.uniform(2.5, 4.0, n)
        colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
        gt = GaussianModel(sh_degree=0, capacity_round=n)
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
        model = GaussianModel(sh_degree=0, capacity_round=n)
        model.create_from_pcd(
            pts + rng.normal(0, 0.02, pts.shape).astype(np.float32), colors)
        opt = dataclasses.replace(OptimizationConfig(), lambda_mask=0.0,
                                  lambda_orientation=0.0)
        model.training_setup(opt)
        return model, cams, opt

    def test_gaussian_step_matches_unsharded(self):
        from hairgs_tpu.core.camera import stack_cameras
        from hairgs_tpu.parallel.slab import make_2d_mesh, make_slab_train_step
        from hairgs_tpu.train import make_gaussian_train_step

        model, cams, opt = self._gaussian_setup(2)
        batch = stack_cameras(cams)
        base = make_gaussian_train_step(opt, CFG, width=W, height=H,
                                        active_sh_degree=0)
        copy = lambda t: jax.tree.map(jnp.array, t)  # base donates arenas
        p1, s1, o1, m1, img1 = base(
            copy(model.params), copy(model.stats), copy(model.opt_state),
            model.active, batch, jnp.asarray(1))

        mesh = make_2d_mesh(2, 4)
        slab = make_slab_train_step(
            "gaussian", opt, CFG, width=W, height=H, active_sh_degree=0,
            mesh=mesh)
        p2, s2, o2, m2, img2 = slab(
            model.params, model.stats, model.opt_state, model.active, batch,
            jnp.asarray(1))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-3)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
        assert img2.shape == (H, W, 3)

    def test_hair_step_matches_unsharded(self):
        import __graft_entry__ as ge
        from hairgs_tpu.core.camera import stack_cameras
        from hairgs_tpu.parallel.slab import make_2d_mesh, make_slab_train_step
        from hairgs_tpu.train import make_hair_train_step

        model, opt, camera_at, (sp, sv), (w, h) = ge._tiny_hair_setup()
        cams = [camera_at(0.8 * i) for i in range(2)]
        batch = stack_cameras(cams)
        cfg = RasterConfig(max_tiles_per_gaussian=8, max_pairs_per_tile=128,
                           chunk=16)
        base = make_hair_train_step(
            opt, cfg, width=w, height=h, active_sh_degree=0,
            spatial_lr_scale=model.spatial_lr_scale,
            dist_to_scale_factor=model.dist_to_scale_factor)
        copy = lambda t: jax.tree.map(jnp.array, t)
        p1, s1, o1, m1, _ = base(
            copy(model.params), model.graph, copy(model.stats),
            copy(model.opt_state), batch, jnp.asarray(1), sp, sv)

        mesh = make_2d_mesh(2, 4)
        slab = make_slab_train_step(
            "hair", opt, cfg, width=w, height=h, active_sh_degree=0,
            spatial_lr_scale=model.spatial_lr_scale,
            dist_to_scale_factor=model.dist_to_scale_factor, mesh=mesh)
        p2, s2, o2, m2, _ = slab(
            model.params, model.graph, model.stats, model.opt_state, batch,
            jnp.asarray(1), sp, sv)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-3)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)


class TestHybridMesh:
    """DCN-aware (data x gauss) mesh layout: on multi-slice topologies the
    data axis must span slices and the gauss axis must stay inside one
    slice's ICI domain (make_2d_mesh docstring recipe)."""

    def test_single_slice_reshape(self):
        import jax

        from hairgs_tpu.parallel.slab import make_2d_mesh

        mesh = make_2d_mesh(2, 4)
        assert mesh.axis_names == ("data", "gauss")
        assert mesh.devices.shape == (2, 4)
        # row-major over the local (single-slice) devices
        np.testing.assert_array_equal(
            np.asarray([d.id for d in mesh.devices.reshape(-1)]),
            np.asarray([d.id for d in jax.devices()[:8]]))

    def test_multi_slice_data_axis_spans_slices(self):
        import jax

        from hairgs_tpu.parallel.slab import make_2d_mesh

        real = jax.devices()[:8]

        class FakeDev:
            """Real CPU device wrapper pretending to live on a 2-slice pod
            (4 devices per slice)."""

            def __init__(self, dev, slice_index):
                self._dev = dev
                self.slice_index = slice_index

            def __getattr__(self, name):
                return getattr(self._dev, name)

            def __repr__(self):
                return f"Fake({self._dev.id}, slice={self.slice_index})"

        fakes = [FakeDev(d, i // 4) for i, d in enumerate(real)]
        mesh = make_2d_mesh(2, 4, devices=fakes)
        assert mesh.devices.shape == (2, 4)
        # every mesh row (fixed data coordinate) lives on ONE slice, and the
        # two rows live on DIFFERENT slices: the gauss axis is ICI-local,
        # the data axis crosses DCN
        row_slices = [
            {d.slice_index for d in mesh.devices[r]} for r in range(2)
        ]
        assert all(len(s) == 1 for s in row_slices), row_slices
        assert row_slices[0] != row_slices[1], row_slices
