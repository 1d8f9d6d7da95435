import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from hairgs_tpu.config import OptimizationConfig
from hairgs_tpu.core.camera import make_camera, Camera
from hairgs_tpu.models.gaussian import GaussianModel, gaussian_render_inputs
from hairgs_tpu.optim import adam_init, adam_step
from hairgs_tpu.render import render, RasterConfig
from hairgs_tpu.train import make_gaussian_train_step

W, H = 48, 40
CFG = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16)


def true_scene(n=30, seed=3):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, 0] = rng.uniform(-0.6, 0.6, n)
    pts[:, 1] = rng.uniform(-0.6, 0.6, n)
    pts[:, 2] = rng.uniform(2.5, 4.0, n)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    return pts, colors


def build_model(pts, colors, sh_degree=0, capacity_round=64):
    m = GaussianModel(sh_degree=sh_degree, capacity_round=capacity_round)
    m.create_from_pcd(pts, colors)
    return m


def render_rgb(model, cam):
    inputs = gaussian_render_inputs(model.params, cam.cam_center, model.active_sh_degree)
    out = render(cam, **inputs, active=model.active, width=W, height=H, config=CFG)
    return out["render"][..., :3]


class TestAdam:
    def test_matches_torch_adam_formula(self):
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        state = adam_init(p)
        lr = 0.01
        new_p, state = adam_step(p, g, state, lr)
        # torch Adam step 1: m=(1-b1)g, v=(1-b2)g^2; mhat=g, vhat=g^2
        expected = np.asarray(p) - lr * np.asarray(g) / (np.abs(np.asarray(g)) + 1e-15)
        np.testing.assert_allclose(np.asarray(new_p), expected, rtol=1e-5)

    def test_two_steps(self):
        p = jnp.asarray([[1.0]])
        state = adam_init(p)
        g = jnp.asarray([[0.5]])
        lr = 0.1
        p1, state = adam_step(p, g, state, lr)
        p2, state = adam_step(p1, g, state, lr)
        b1, b2 = 0.9, 0.999
        m = (1 - b1) * 0.5 * (1 + b1)
        v = (1 - b2) * 0.25 * (1 + b2)
        mhat = m / (1 - b1**2)
        vhat = v / (1 - b2**2)
        expected = float(p1[0, 0]) - lr * mhat / (np.sqrt(vhat) + 1e-15)
        np.testing.assert_allclose(float(p2[0, 0]), expected, rtol=1e-5)


class TestCreateFromPcd:
    def test_shapes_and_padding(self):
        pts, colors = true_scene(n=30)
        m = build_model(pts, colors, capacity_round=64)
        assert m.count == 30
        assert m.capacity == 64
        assert int(jnp.sum(m.active)) == 30
        # initial opacity / mask activations
        act_opa = 1 / (1 + np.exp(-np.asarray(m.params.opacity)[:30, 0]))
        np.testing.assert_allclose(act_opa, 0.1, rtol=1e-5)

    def test_init_scale_from_knn(self):
        # two clusters of known spacing -> scale = sqrt(mean 3nn sq dist)
        pts = np.array(
            [[0, 0, 3], [0.1, 0, 3], [0, 0.1, 3], [0.1, 0.1, 3]], dtype=np.float32
        )
        colors = np.full((4, 3), 0.5, dtype=np.float32)
        m = build_model(pts, colors, capacity_round=64)
        scales = np.exp(np.asarray(m.params.scaling)[:4])
        # 3NN sq dists for each corner of the square: 0.01, 0.01, 0.02
        expected = np.sqrt((0.01 + 0.01 + 0.02) / 3)
        np.testing.assert_allclose(scales, expected, rtol=1e-4)


class TestTrainStep:
    def _setup(self, lambda_mask=0.0, lambda_orientation=0.0):
        pts, colors = true_scene()
        gt_model = build_model(pts, colors)
        cams = []
        for angle in (0.0, 0.25):
            R = np.array(
                [
                    [np.cos(angle), 0, np.sin(angle)],
                    [0, 1, 0],
                    [-np.sin(angle), 0, np.cos(angle)],
                ]
            )
            cam = make_camera(R, np.array([0, 0, 0.2]), fovx=1.2, fovy=1.0)
            img = render_rgb(gt_model, cam)
            cams.append(cam._replace(image=img))
        # perturbed init
        rng = np.random.default_rng(9)
        init_pts = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
        init_colors = np.clip(colors + rng.normal(0, 0.1, colors.shape), 0.01, 0.99).astype(np.float32)
        model = build_model(init_pts, init_colors)
        opt_cfg = dataclasses.replace(
            OptimizationConfig(),
            lambda_mask=lambda_mask,
            lambda_orientation=lambda_orientation,
        )
        model.training_setup(opt_cfg)
        step_fn = make_gaussian_train_step(
            opt_cfg, CFG, width=W, height=H, active_sh_degree=0
        )
        return model, cams, step_fn

    def test_loss_decreases(self):
        model, cams, step_fn = self._setup()
        losses = []
        params, stats, opt_state = model.params, model.stats, model.opt_state
        for it in range(1, 41):
            cam = cams[it % len(cams)]
            params, stats, opt_state, metrics, _ = step_fn(
                params, stats, opt_state, model.active, cam, jnp.asarray(it)
            )
            losses.append(float(metrics["loss"]))
        first = np.mean(losses[:2])  # one loss per camera
        last = np.mean(losses[-2:])
        assert last < first * 0.8, losses[:3] + losses[-3:]
        assert np.isfinite(losses).all()

    def test_stats_accumulate(self):
        model, cams, step_fn = self._setup()
        params, stats, opt_state = model.params, model.stats, model.opt_state
        params, stats, opt_state, _, _ = step_fn(
            params, stats, opt_state, model.active, cams[0], jnp.asarray(1)
        )
        denom = np.asarray(stats.denom)[:, 0]
        assert denom[: model.count].max() == 1.0
        assert denom[model.count:].max() == 0.0 if model.count < model.capacity else True
        assert np.asarray(stats.xyz_grad_accum).max() > 0

    def test_batched_views(self):
        from hairgs_tpu.core.camera import stack_cameras

        model, cams, step_fn = self._setup()
        batch = stack_cameras(cams)
        params, stats, opt_state, metrics, _ = step_fn(
            model.params, model.stats, model.opt_state, model.active, batch, jnp.asarray(1)
        )
        assert np.isfinite(float(metrics["loss"]))

    def test_inactive_rows_frozen(self):
        model, cams, step_fn = self._setup()
        before = np.asarray(model.params.xyz)[model.count:]
        params, stats, opt_state, _, _ = step_fn(
            model.params, model.stats, model.opt_state, model.active, cams[0], jnp.asarray(1)
        )
        after = np.asarray(params.xyz)[model.count:]
        np.testing.assert_array_equal(before, after)


class TestHairStep:
    def test_hair_step_with_all_regularizers(self):
        import jax.numpy as jnp

        from tests.test_topo import make_hair_model, two_strands
        from hairgs_tpu.core.camera import make_camera
        from hairgs_tpu.topo.strands import magnet_indices, smooth_pair_indices
        from hairgs_tpu.train.trainer import make_hair_train_step

        eps, pairs = two_strands()
        eps = eps * 20  # scale up so segments are a few pixels on screen
        eps[:, 2] += 3.0
        opt = dataclasses.replace(OptimizationConfig(), lambda_magnet=1.0)
        m = make_hair_model(eps, pairs, cfg=opt, width=0.02)
        cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=1.0)
        rng = np.random.default_rng(0)
        cam = cam._replace(
            image=jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
            mask=jnp.asarray((rng.uniform(0, 1, (H, W)) > 0.5).astype(np.float32)),
            orientation=jnp.asarray(rng.uniform(0, np.pi, (H, W)).astype(np.float32)),
            confidence=jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)),
        )
        sp, sv = smooth_pair_indices(m.strands_info)
        mi = magnet_indices(m)
        step_fn = make_hair_train_step(
            opt, CFG, width=W, height=H, active_sh_degree=0,
            dist_to_scale_factor=m.dist_to_scale_factor, use_magnet=True,
        )
        params, stats, opt_state, metrics, _ = step_fn(
            m.params, m.graph, m.stats, m.opt_state, cam, jnp.asarray(1),
            jnp.asarray(sp), jnp.asarray(sv),
            magnet_idx=tuple(jnp.asarray(x) for x in mi),
        )
        assert np.isfinite(float(metrics["loss"]))
        assert "loss/smooth" in metrics and "loss/magnet" in metrics
        assert np.isfinite(np.asarray(params.endpoints)).all()


class TestDensification:
    def test_densify_runs_and_prunes(self):
        pts, colors = true_scene(n=50)
        model = build_model(pts, colors)
        opt_cfg = OptimizationConfig()
        model.training_setup(opt_cfg)
        # fake stats: large grads for first 10 (clone or split), rest zero
        stats = model.stats
        accum = np.zeros((model.capacity, 1), np.float32)
        accum[:10] = 1.0
        denom = np.zeros((model.capacity, 1), np.float32)
        denom[:model.count] = 1.0
        model.stats = stats._replace(
            xyz_grad_accum=jnp.asarray(accum), denom=jnp.asarray(denom)
        )
        # make a couple of gaussians transparent so they get pruned
        arrays = model.host_arrays()
        arrays["opacity"][40:50] = -20.0  # sigmoid ~ 0
        model._install(arrays, model.count, moments=model.host_moments(),
                       step=int(model.opt_state.step))
        model.stats = stats._replace(
            xyz_grad_accum=jnp.asarray(accum), denom=jnp.asarray(denom)
        )
        info = model.densification(extent=3.0, max_screen_size=None)
        assert info["clone"] + info["split"] == 10
        assert info["prune_low_opacity"] >= 10
        # count = 50 + clones + 2*split - split - pruned
        expected = 50 + info["clone"] + info["split"] - info["prune_total"]
        assert model.count == expected
        # stats reset
        assert float(jnp.sum(model.stats.denom)) == 0.0

    def test_reset_opacity(self):
        pts, colors = true_scene(n=20)
        model = build_model(pts, colors)
        model.training_setup(OptimizationConfig())
        model.reset_opacity()
        opa = 1 / (1 + np.exp(-np.asarray(model.params.opacity)[:20, 0]))
        np.testing.assert_allclose(opa, 0.01, rtol=1e-4)
        # moments zeroed for opacity only
        assert float(jnp.abs(model.opt_state.mu.opacity).max()) == 0.0


class TestTileBudgetController:
    """Adaptive tile-budget state machine (train.TileBudgetController)."""

    def _ctl(self, base=16):
        from train import TileBudgetController

        return TileBudgetController(base)

    def test_grows_on_large_overflow(self):
        ctl = self._ctl(16)
        # >1% of n_prims * budget truncated -> double
        assert ctl.update(overflow_pairs=200, n_prims=1000, budget=16) == 32
        assert ctl.update(overflow_pairs=600, n_prims=1000, budget=32) == 64

    def test_capped_at_64(self):
        ctl = self._ctl(16)
        assert ctl.update(overflow_pairs=10**6, n_prims=1000, budget=64) is None

    def test_small_overflow_tolerated(self):
        ctl = self._ctl(16)
        # below the 1% threshold: keep the budget (CUDA parity is bounded
        # by the 3-sigma rect anyway; a few clipped pairs are invisible)
        assert ctl.update(overflow_pairs=100, n_prims=1000, budget=16) is None

    def test_shrinks_after_streak_and_not_below_base(self):
        ctl = self._ctl(16)
        assert ctl.update(10**6, 1000, 16) == 32
        for _ in range(19):
            assert ctl.update(0, 1000, 32) is None
        assert ctl.update(0, 1000, 32) == 16
        # at the configured base: never shrink further
        for _ in range(40):
            assert ctl.update(0, 1000, 16) is None

    def test_overflow_resets_streak(self):
        ctl = self._ctl(16)
        assert ctl.update(10**6, 1000, 16) == 32
        for _ in range(19):
            assert ctl.update(0, 1000, 32) is None
        # a single non-zero overflow (even sub-threshold) restarts the streak
        assert ctl.update(1, 1000, 32) is None
        for _ in range(19):
            assert ctl.update(0, 1000, 32) is None
        assert ctl.update(0, 1000, 32) == 16


class TestPairCapacityController:
    """Adaptive compact pair-table sizing (train.PairCapacityController)."""

    def _ctl(self, granule=1024, shrink_after=5):
        from train import PairCapacityController

        return PairCapacityController(granule, shrink_after=shrink_after)

    def test_grows_immediately_on_truncation(self):
        ctl = self._ctl()
        # jumps straight to the bucketed demand (headroom 1.25), at least
        # one granule above the current capacity
        new = ctl.update(overflow_capacity=5, pairs_demand=10000,
                         capacity=8192)
        assert new == 13312  # ceil(10000*1.25 / 1024) * 1024
        # even when demand is stale/low, growth is at least one granule
        assert ctl.update(1, 100, 8192) == 8192 + 1024

    def test_shrinks_only_after_streak(self):
        ctl = self._ctl(shrink_after=3)
        for _ in range(2):
            assert ctl.update(0, 1000, 8192) is None
        assert ctl.update(0, 1000, 8192) == 2048  # ceil(1250/1024)*1024
        # well-occupied tables never shrink
        for _ in range(10):
            assert ctl.update(0, 5000, 8192) is None

    def test_occupancy_resets_streak(self):
        ctl = self._ctl(shrink_after=3)
        assert ctl.update(0, 1000, 8192) is None
        assert ctl.update(0, 6000, 8192) is None  # >50%: streak resets
        assert ctl.update(0, 1000, 8192) is None
        assert ctl.update(0, 1000, 8192) is None
        assert ctl.update(0, 1000, 8192) == 2048

    def test_no_thrash_within_one_granule(self):
        ctl = self._ctl(shrink_after=1)
        # new bucket within one granule of current capacity: keep it
        assert ctl.update(0, 1500, 3072) is None


class TestPSNR:
    def test_known_value(self):
        from hairgs_tpu.losses.photometric import psnr

        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        # mse = 0.01 -> -10*log10(0.01) = 20 dB
        assert abs(float(psnr(a, b)) - 20.0) < 1e-4

    def test_identical_images_capped(self):
        from hairgs_tpu.losses.photometric import psnr

        a = jnp.ones((4, 4, 3)) * 0.5
        assert float(psnr(a, a)) == 120.0  # mse floor 1e-12

    def test_masked_ignores_background(self):
        from hairgs_tpu.losses.photometric import masked_psnr

        a = jnp.zeros((4, 4, 3))
        b = a.at[0, 0].set(0.1).at[3, 3].set(0.9)
        mask = jnp.zeros((4, 4)).at[0, 0].set(1.0)
        # only the (0,0) pixel counts: mse = 0.01 -> 20 dB
        assert abs(float(masked_psnr(a, b, mask)) - 20.0) < 1e-4

    def test_train_step_reports_psnr(self):
        pts, colors = true_scene()
        model = build_model(pts, colors)
        opt = dataclasses.replace(OptimizationConfig(), lambda_mask=0.0,
                                  lambda_orientation=0.0)
        model.training_setup(opt)
        cam = make_camera(np.eye(3), np.array([0.0, 0.0, 1.5]), 0.9, 0.9)
        img = render_rgb(model, cam)
        cam = cam._replace(image=img)
        step = make_gaussian_train_step(
            opt, CFG, width=W, height=H, active_sh_degree=0)
        _, _, _, metrics, _ = step(model.params, model.stats, model.opt_state,
                                   model.active, cam, jnp.asarray(1))
        # the render matches GT exactly -> psnr at the 120 dB cap
        assert float(metrics["psnr"]) > 60.0


class TestBoolFlags:
    def test_default_true_flag_has_no_form(self):
        from argparse import ArgumentParser

        from hairgs_tpu.config import OptimizationConfig, add_config_args

        parser = ArgumentParser()
        add_config_args(parser, OptimizationConfig)
        args = parser.parse_args(["--no-bidirectional_eval"])
        assert args.bidirectional_eval is False
        args = parser.parse_args([])
        assert args.bidirectional_eval is True
