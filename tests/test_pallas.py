"""Pallas compositor parity vs the XLA scan compositor (interpret mode on CPU)."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hairgs_tpu.render import render, RasterConfig
from tests.test_render import WIDTH, HEIGHT, make_scene

XLA_CFG = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16,
                       use_pallas=False)
PL_CFG = dataclasses.replace(XLA_CFG, use_pallas=True)


def run(cfg, scene, **kw):
    cam, (means, scales, q, opacity, features) = scene
    return render(cam, means3d=means, scales=scales, rotations=q,
                  opacity=opacity, features=features,
                  width=WIDTH, height=HEIGHT, config=cfg, **kw)


class TestPallasForward:
    def test_matches_xla(self):
        scene = make_scene(n=50)
        out_x = run(XLA_CFG, scene)
        out_p = run(PL_CFG, scene)
        assert int(out_p["overflow_tiles"]) == 0
        np.testing.assert_allclose(np.asarray(out_p["render"]),
                                   np.asarray(out_x["render"]), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out_p["final_T"]),
                                   np.asarray(out_x["final_T"]), atol=3e-5)

    def test_active_mask(self):
        scene = make_scene(n=20)
        cam, (means, scales, q, opacity, features) = scene
        active = jnp.zeros(20, dtype=bool).at[:10].set(True)
        out_p = run(PL_CFG, scene, active=active)
        out_x = run(XLA_CFG, scene, active=active)
        np.testing.assert_allclose(np.asarray(out_p["render"]),
                                   np.asarray(out_x["render"]), atol=3e-5)


class TestDualCotangent:
    def test_trainer_grads_and_stats_match_xla(self):
        """The single-pull pallas backward must reproduce both the total-loss
        parameter gradients AND the photometric-only viewspace stats that the
        XLA path obtains with two VJP pulls."""
        import dataclasses as dc

        from hairgs_tpu.config import OptimizationConfig
        from hairgs_tpu.models.gaussian import gaussian_render_inputs
        from hairgs_tpu.train.trainer import render_loss_and_grads

        scene = make_scene(n=30, opacity_max=0.8)
        cam, (means, scales, q, opacity, features) = scene
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)).astype(np.float32))
        mask = jnp.asarray((rng.uniform(0, 1, (HEIGHT, WIDTH)) > 0.5).astype(np.float32))
        orient = jnp.asarray(rng.uniform(0, np.pi, (HEIGHT, WIDTH)).astype(np.float32))
        conf = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH)).astype(np.float32))
        cam = cam._replace(image=img, mask=mask, orientation=orient, confidence=conf)

        from hairgs_tpu.models.gaussian import GaussianParams

        params = GaussianParams(
            xyz=means,
            features_dc=((features - 0.5) / 0.28209479177387814)[:, None, :],
            features_rest=jnp.zeros((30, 0, 3)),
            scaling=jnp.log(scales),
            rotation=q,
            opacity=jnp.log(opacity / (1 - opacity))[:, None],
            mask=jnp.zeros((30, 1)),
        )
        active = jnp.ones(30, dtype=bool)
        opt_cfg = OptimizationConfig()

        results = {}
        for name, cfg in (("xla", XLA_CFG), ("pallas", PL_CFG)):
            loss, grads, offset_grad, aux = render_loss_and_grads(
                lambda p: gaussian_render_inputs(p, cam.cam_center, 0),
                params, cam, active, opt_cfg, cfg, WIDTH, HEIGHT,
            )
            results[name] = (float(loss), grads, np.asarray(offset_grad))

        np.testing.assert_allclose(results["xla"][0], results["pallas"][0],
                                   rtol=1e-4)
        for gx, gp in zip(jax.tree.leaves(results["xla"][1]),
                          jax.tree.leaves(results["pallas"][1])):
            if np.asarray(gx).size == 0:
                continue
            scale = max(np.abs(np.asarray(gx)).max(), 1e-4)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                       atol=3e-3 * scale, rtol=3e-3)
        ox, op_ = results["xla"][2], results["pallas"][2]
        assert np.abs(ox).max() > 0
        np.testing.assert_allclose(op_, ox, atol=3e-3 * max(np.abs(ox).max(), 1e-4),
                                   rtol=3e-3)


class TestFeatBf16:
    """Mixed-precision feature plane (RasterConfig.feat_bf16): geometry and
    all accumulation stay f32, so the render and its gradients track the f32
    path to bf16 rounding (~0.4% relative)."""

    def test_forward_close_to_f32(self):
        scene = make_scene(n=50)
        out_f = run(PL_CFG, scene)
        out_b = run(dataclasses.replace(PL_CFG, feat_bf16=True), scene)
        np.testing.assert_allclose(np.asarray(out_b["render"]),
                                   np.asarray(out_f["render"]),
                                   atol=2e-2, rtol=2e-2)
        # transmittance only depends on geometry/opacity (f32): tight
        np.testing.assert_allclose(np.asarray(out_b["final_T"]),
                                   np.asarray(out_f["final_T"]), atol=3e-5)

    def test_grads_close_to_f32(self):
        scene = make_scene(n=40, opacity_max=0.8)
        cam, args = scene
        rng = np.random.default_rng(9)
        gw = jnp.asarray(rng.normal(size=(HEIGHT, WIDTH, 3)).astype(np.float32))
        bf_cfg = dataclasses.replace(PL_CFG, feat_bf16=True)

        def loss(cfg, means, scales, q, opacity, features):
            out = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] * gw)

        g_f = jax.grad(lambda *a: loss(PL_CFG, *a), argnums=(0, 1, 2, 3, 4))(*args)
        g_b = jax.grad(lambda *a: loss(bf_cfg, *a), argnums=(0, 1, 2, 3, 4))(*args)
        for name, gf, gb in zip(["means", "scales", "q", "opacity", "features"],
                                g_f, g_b):
            scale = np.maximum(np.abs(np.asarray(gf)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gb), np.asarray(gf), atol=2e-2 * scale, rtol=2e-2,
                err_msg=f"bf16 gradient drift for {name}",
            )


class TestPallasBackward:
    def test_grads_match_xla(self):
        scene = make_scene(n=40, opacity_max=0.8)
        cam, args = scene
        rng = np.random.default_rng(7)
        gw = jnp.asarray(rng.normal(size=(HEIGHT, WIDTH, 3)).astype(np.float32))

        def loss(cfg, means, scales, q, opacity, features):
            out = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] * gw) + 0.3 * jnp.sum(out["final_T"])

        g_x = jax.grad(lambda *a: loss(XLA_CFG, *a), argnums=(0, 1, 2, 3, 4))(*args)
        g_p = jax.grad(lambda *a: loss(PL_CFG, *a), argnums=(0, 1, 2, 3, 4))(*args)
        names = ["means", "scales", "q", "opacity", "features"]
        for name, gx, gp in zip(names, g_x, g_p):
            scale = np.maximum(np.abs(np.asarray(gx)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), atol=2e-3 * scale, rtol=2e-3,
                err_msg=f"gradient mismatch for {name}",
            )

    def test_grads_match_xla_with_antialiasing(self):
        """The Mip-Splatting compensation multiplies opacity OUTSIDE the
        custom-VJP compositor, so its gradient path (into scales via the
        conic determinant) must survive the pallas backward unchanged —
        the Stage-III corrective legs train with AA on the pallas path."""
        scene = make_scene(n=40, opacity_max=0.8)
        cam, args = scene
        rng = np.random.default_rng(11)
        gw = jnp.asarray(rng.normal(size=(HEIGHT, WIDTH, 3)).astype(np.float32))
        xla_aa = dataclasses.replace(XLA_CFG, antialiasing=True)
        pl_aa = dataclasses.replace(PL_CFG, antialiasing=True)

        def loss(cfg, means, scales, q, opacity, features):
            out = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] * gw) + 0.3 * jnp.sum(out["final_T"])

        g_x = jax.grad(lambda *a: loss(xla_aa, *a), argnums=(0, 1, 2, 3, 4))(*args)
        g_p = jax.grad(lambda *a: loss(pl_aa, *a), argnums=(0, 1, 2, 3, 4))(*args)
        for name, gx, gp in zip(["means", "scales", "q", "opacity", "features"],
                                g_x, g_p):
            scale = np.maximum(np.abs(np.asarray(gx)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), atol=2e-3 * scale, rtol=2e-3,
                err_msg=f"AA gradient mismatch for {name}",
            )


class TestStatsGating:
    """RasterConfig.viewspace_stats=False compiles the densification-stats
    rows out of the pallas backward without touching parameter gradients."""

    def test_param_grads_identical_aux_zero(self):
        scene = make_scene(n=40)
        cam, (means, scales, q, opacity, features) = scene
        on = PL_CFG
        off = dataclasses.replace(PL_CFG, viewspace_stats=False)
        offset = jnp.zeros((40, 2), jnp.float32)

        def loss(cfg, s, off2d):
            out = render(cam, means3d=means, scales=s, rotations=q,
                         opacity=opacity, features=features,
                         mean2d_offset=off2d,
                         width=WIDTH, height=HEIGHT, config=cfg)
            # photometric losses read render_photo (dual-cotangent split)
            return (jnp.sum(out["render_photo"] ** 2)
                    + jnp.sum(out["final_T"]))

        g_on = jax.grad(loss, argnums=(1, 2))(on, scales, offset)
        g_off = jax.grad(loss, argnums=(1, 2))(off, scales, offset)
        np.testing.assert_array_equal(np.asarray(g_off[0]),
                                      np.asarray(g_on[0]))
        # stats consumers are off: the aux-row viewspace grads must be zero
        assert float(jnp.max(jnp.abs(g_on[1]))) > 0
        np.testing.assert_array_equal(np.asarray(g_off[1]),
                                      np.zeros_like(np.asarray(g_off[1])))


class TestDmaLookahead:
    """RasterConfig.dma_lookahead banks the compositor's input DMA slots and
    prefetches the next tile's copies — pure scheduling, so forward AND
    gradients must be bit-identical with the flag on."""

    def test_bit_identical_fwd_and_grads(self):
        scene = make_scene(n=32)
        cam, (means, scales, q, opacity, features) = scene
        on = dataclasses.replace(PL_CFG, dma_lookahead=True)

        def loss(cfg, s):
            out = render(cam, means3d=means, scales=s, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]), out

        (l0, out0), g0 = jax.value_and_grad(
            lambda s: loss(PL_CFG, s), has_aux=True)(scales)
        (l1, out1), g1 = jax.value_and_grad(
            lambda s: loss(on, s), has_aux=True)(scales)
        np.testing.assert_array_equal(np.asarray(out0["render"]),
                                      np.asarray(out1["render"]))
        np.testing.assert_array_equal(np.asarray(out0["final_T"]),
                                      np.asarray(out1["final_T"]))
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


class TestPairCapacity:
    """Compact paged pair table (RasterConfig.pair_capacity)."""

    def test_ample_capacity_bit_identical(self):
        """With capacity = measured demand (a genuinely SMALLER table than
        the worst case) the compact layout must reproduce the worst-case
        table exactly (forward AND gradients)."""
        from hairgs_tpu.render.binning import paged_capacity

        scene = make_scene(n=32)
        cam, (means, scales, q, opacity, features) = scene
        big = dataclasses.replace(PL_CFG)

        def loss(cfg, s):
            out = render(cam, means3d=means, scales=s, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] ** 2), out

        (l_b, out_b), g_b = jax.value_and_grad(
            lambda s: loss(big, s), has_aux=True)(scales)
        demand = int(out_b["pairs_demand"])
        ts = PL_CFG.tile_size
        nt = (((WIDTH + ts - 1) // ts) * ((HEIGHT + ts - 1) // ts))
        assert demand < paged_capacity(32, PL_CFG.max_tiles_per_gaussian,
                                       nt, PL_CFG.chunk)
        small = dataclasses.replace(PL_CFG, pair_capacity=demand)
        (l_s, out_s), g_s = jax.value_and_grad(
            lambda s: loss(small, s), has_aux=True)(scales)
        assert int(out_s["overflow_capacity"]) == 0
        assert int(out_s["overflow_tiles"]) == int(out_b["overflow_tiles"])
        np.testing.assert_array_equal(np.asarray(out_s["render"]),
                                      np.asarray(out_b["render"]))
        np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_b))

    def test_tight_capacity_truncates_and_counts(self):
        """A deliberately tiny capacity must truncate (counts sum bounded by
        the content cap) and surface the drops in overflow_tiles."""
        from hairgs_tpu.render.binning import compact_capacity

        scene = make_scene(n=48)
        cam, (means, scales, q, opacity, features) = scene
        cap = 3 * PL_CFG.chunk  # tiny: 3 content chunks + spare
        cfg = dataclasses.replace(PL_CFG, pair_capacity=cap)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features,
                     width=WIDTH, height=HEIGHT, config=cfg)
        out_big = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=PL_CFG)
        assert int(jnp.sum(out["tile_counts"])) <= cap - PL_CFG.chunk
        dropped = (int(jnp.sum(out_big["tile_counts"]))
                   - int(jnp.sum(out["tile_counts"])))
        assert dropped > 0
        assert int(out["overflow_capacity"]) == dropped
        assert int(out_big["overflow_capacity"]) == 0
        # demand is capacity-independent and covers the big table's content
        assert (int(out["pairs_demand"]) == int(out_big["pairs_demand"])
                >= int(jnp.sum(out_big["tile_counts"])))
        # gradients stay finite under truncation
        def loss(s):
            o = render(cam, means3d=means, scales=s, rotations=q,
                       opacity=opacity, features=features,
                       width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(o["render"] ** 2)
        g = jax.grad(loss)(scales)
        assert np.all(np.isfinite(np.asarray(g)))
        assert compact_capacity(cap, 48, 16, 12, 16) == cap


class TestAlphaMin:
    """RasterConfig.alpha_min: the per-pair alpha gate (reference 1/255,
    forward.cu:343-351). Splats below the gate contribute nothing and get
    ZERO gradient — lowering the gate un-freezes them (the AA-on-a-model-
    trained-without-AA regime pushes most thin-segment alphas sub-gate)."""

    def test_default_is_reference_gate(self):
        assert RasterConfig().alpha_min == 1.0 / 255.0

    def _scene_with_subgate(self):
        scene = make_scene(n=24, opacity_max=0.8)
        cam, (means, scales, q, opacity, features) = scene
        # half the gaussians sit below the 1/255 gate at their center pixel
        opacity = opacity.at[12:].set(2e-3)
        return cam, (means, scales, q, opacity, features)

    def _grads(self, cfg, scene):
        cam, args = scene
        rng = np.random.default_rng(5)
        gw = jnp.asarray(rng.normal(size=(HEIGHT, WIDTH, 3)).astype(np.float32))

        def loss(means, scales, q, opacity, features):
            out = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] * gw)

        return jax.grad(loss, argnums=(0, 3))(*args)  # d means, d opacity

    def test_subgate_frozen_at_default_unfrozen_below(self):
        scene = self._scene_with_subgate()
        for base in (XLA_CFG, PL_CFG):
            g_mean, g_opa = self._grads(base, scene)
            # sub-gate rows: exactly zero gradient (frozen)
            assert float(jnp.abs(g_opa[12:]).max()) == 0.0, base.use_pallas
            assert float(jnp.abs(g_mean[12:]).max()) == 0.0
            low = dataclasses.replace(base, alpha_min=1e-5)
            g_mean2, g_opa2 = self._grads(low, scene)
            # the lowered gate restores gradient flow to every sub-gate row
            assert np.all(np.abs(np.asarray(g_opa2[12:])) > 0), base.use_pallas
            # visible rows keep gradients of the same scale
            ref = float(jnp.abs(g_opa[:12]).max())
            assert float(jnp.abs(g_opa2[:12]).max()) == pytest.approx(ref, rel=0.2)

    def test_paths_agree_at_lowered_gate(self):
        scene = self._scene_with_subgate()
        low_x = dataclasses.replace(XLA_CFG, alpha_min=1e-5)
        low_p = dataclasses.replace(PL_CFG, alpha_min=1e-5)
        out_x = run(low_x, scene)
        out_p = run(low_p, scene)
        np.testing.assert_allclose(np.asarray(out_p["render"]),
                                   np.asarray(out_x["render"]), atol=3e-5)
        gx = self._grads(low_x, scene)
        gp = self._grads(low_p, scene)
        for x, p in zip(gx, gp):
            scale = np.maximum(np.abs(np.asarray(x)).max(), 1e-3)
            np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                       atol=2e-3 * scale, rtol=2e-3)
