import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hairgs_tpu.core.camera import make_camera
from hairgs_tpu.render import render, RasterConfig, composite_naive
from hairgs_tpu.render.preprocess import preprocess
from hairgs_tpu.render.renderer import sh_to_color


WIDTH, HEIGHT = 48, 40  # deliberately not multiples of the tile size


def make_scene(n=60, seed=0, opacity_max=0.9):
    rng = np.random.default_rng(seed)
    means = np.zeros((n, 3), dtype=np.float32)
    means[:, 0] = rng.uniform(-0.8, 0.8, n)
    means[:, 1] = rng.uniform(-0.8, 0.8, n)
    means[:, 2] = rng.uniform(2.0, 5.0, n)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.12), (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opacity = rng.uniform(0.1, opacity_max, n).astype(np.float32)
    features = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=1.0)
    return cam, (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(opacity), jnp.asarray(features))


def naive_render(cam, means, scales, q, opacity, features, bg=None, mean2d_offset=None):
    prep = preprocess(means, scales, q, cam, WIDTH, HEIGHT, 16,
                      mean2d_offset=mean2d_offset)
    img, trans = composite_naive(
        prep.xy, prep.conic, opacity, features, prep.depth, prep.valid,
        WIDTH, HEIGHT, bg=bg, rect=prep.rect,
    )
    return img, trans


class TestForwardParity:
    def test_tiled_matches_naive(self):
        cam, (means, scales, q, opacity, features) = make_scene()
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features,
                     width=WIDTH, height=HEIGHT, config=cfg)
        assert int(out["overflow_pairs"]) == 0
        assert int(out["overflow_tiles"]) == 0
        img_naive, trans_naive = naive_render(cam, means, scales, q, opacity, features)
        np.testing.assert_allclose(np.asarray(out["render"]), np.asarray(img_naive),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["final_T"]), np.asarray(trans_naive),
                                   atol=2e-5)

    def test_background_composition(self):
        cam, (means, scales, q, opacity, features) = make_scene(n=10)
        bg = jnp.asarray([0.2, 0.4, 0.6])
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=32, chunk=16)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features, bg=bg,
                     width=WIDTH, height=HEIGHT, config=cfg)
        img_naive, _ = naive_render(cam, means, scales, q, opacity, features, bg=bg)
        np.testing.assert_allclose(np.asarray(out["render"]), np.asarray(img_naive),
                                   atol=2e-5)
        # empty corners show pure background
        corner = np.asarray(out["render"])[0, 0]
        assert np.abs(corner - np.asarray(bg)).max() < 0.5  # some bg visible

    def test_single_gaussian_peak(self):
        # A lone opaque Gaussian: pixel at its projected center has value
        # opacity * color (power = 0 there), cf. forward.cu:335-355.
        cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=1.0)
        means = jnp.asarray([[0.0, 0.0, 3.0]])
        scales = jnp.asarray([[0.4, 0.4, 0.4]])
        q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        opacity = jnp.asarray([0.8])
        features = jnp.asarray([[1.0, 0.5, 0.25]])
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=16, chunk=16)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features,
                     width=WIDTH, height=HEIGHT, config=cfg)
        prep = preprocess(means, scales, q, cam, WIDTH, HEIGHT, 16)
        cx, cy = np.asarray(prep.xy)[0]
        px, py = int(round(cx)), int(round(cy))
        val = np.asarray(out["render"])[py, px]
        # sub-pixel offset of the true center vs pixel center -> loose tol
        np.testing.assert_allclose(val, 0.8 * np.asarray([1.0, 0.5, 0.25]), rtol=0.05)

    def test_visibility_filter(self):
        cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=1.0)
        means = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, -3.0]])  # second behind camera
        scales = jnp.full((2, 3), 0.05)
        q = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
        opacity = jnp.asarray([0.5, 0.5])
        features = jnp.ones((2, 3))
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=16, chunk=16)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features,
                     width=WIDTH, height=HEIGHT, config=cfg)
        vis = np.asarray(out["visibility_filter"])
        assert vis[0] and not vis[1]

    def test_active_mask_culls(self):
        cam, (means, scales, q, opacity, features) = make_scene(n=20)
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16)
        active = jnp.zeros(20, dtype=bool).at[:10].set(True)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features, active=active,
                     width=WIDTH, height=HEIGHT, config=cfg)
        out_sub = render(cam, means3d=means[:10], scales=scales[:10], rotations=q[:10],
                         opacity=opacity[:10], features=features[:10],
                         width=WIDTH, height=HEIGHT, config=cfg)
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   np.asarray(out_sub["render"]), atol=1e-6)

    def test_overflow_reported(self):
        # giant gaussian covering the whole screen with a tiny tile budget
        cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=1.0)
        means = jnp.asarray([[0.0, 0.0, 3.0]])
        scales = jnp.asarray([[2.0, 2.0, 2.0]])
        q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        cfg = RasterConfig(max_tiles_per_gaussian=2, max_pairs_per_tile=16, chunk=16)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=jnp.asarray([0.5]), features=jnp.ones((1, 3)),
                     width=WIDTH, height=HEIGHT, config=cfg)
        assert int(out["overflow_pairs"]) > 0


class TestBackward:
    def test_grads_match_naive_autodiff(self):
        cam, (means, scales, q, opacity, features) = make_scene(n=40, opacity_max=0.8)
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16)
        rng = np.random.default_rng(7)
        gw = jnp.asarray(rng.normal(size=(HEIGHT, WIDTH, 3)).astype(np.float32))

        def loss_tiled(means, scales, q, opacity, features):
            out = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] * gw)

        def loss_naive(means, scales, q, opacity, features):
            img, _ = naive_render(cam, means, scales, q, opacity, features)
            return jnp.sum(img * gw)

        args = (means, scales, q, opacity, features)
        g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
        g_naive = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(*args)
        names = ["means", "scales", "q", "opacity", "features"]
        for name, gt, gn in zip(names, g_tiled, g_naive):
            scale = np.maximum(np.abs(np.asarray(gn)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gt), np.asarray(gn), atol=2e-3 * scale, rtol=2e-3,
                err_msg=f"gradient mismatch for {name}",
            )

    def test_final_t_gradient(self):
        # gradient flowing through final transmittance (background path)
        cam, (means, scales, q, opacity, features) = make_scene(n=20, opacity_max=0.8)
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=32, chunk=16)
        bg = jnp.asarray([1.0, 1.0, 1.0])

        def loss_tiled(opacity):
            out = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features, bg=bg,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"])

        def loss_naive(opacity):
            img, _ = naive_render(cam, means, scales, q, opacity, features, bg=bg)
            return jnp.sum(img)

        gt = jax.grad(loss_tiled)(opacity)
        gn = jax.grad(loss_naive)(opacity)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gn), atol=1e-4, rtol=1e-3)

    def test_mean2d_offset_gradient(self):
        # the densification-stats hook: grad w.r.t. the zero offset equals the
        # CUDA dL_dmean2D (NDC half-extent units)
        cam, (means, scales, q, opacity, features) = make_scene(n=20, opacity_max=0.8)
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=32, chunk=16)
        zeros = jnp.zeros((20, 2))

        def loss(off):
            out = render(cam, means3d=means, scales=scales, rotations=q,
                         opacity=opacity, features=features, mean2d_offset=off,
                         width=WIDTH, height=HEIGHT, config=cfg)
            return jnp.sum(out["render"] ** 2)

        g = jax.grad(loss)(zeros)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

        # cross-check against naive autodiff of xy scaled by (0.5W, 0.5H)
        def loss_naive(off):
            img, _ = naive_render(cam, means, scales, q, opacity, features,
                                  mean2d_offset=off)
            return jnp.sum(img ** 2)

        gn = jax.grad(loss_naive)(zeros)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gn), atol=1e-3, rtol=1e-3)


class TestSHColor:
    def test_degree0(self):
        n = 5
        rng = np.random.default_rng(0)
        dc = jnp.asarray(rng.normal(size=(n, 1, 3)).astype(np.float32))
        rest = jnp.zeros((n, 0, 3))
        means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        cam_center = jnp.zeros(3)
        rgb = sh_to_color(dc, rest, means, cam_center, 0, 0)
        expected = np.maximum(np.asarray(dc)[:, 0] * 0.28209479177387814 + 0.5, 0.0)
        np.testing.assert_allclose(np.asarray(rgb), expected, atol=1e-6)


class TestAntialiasing:
    """Opt-in Mip-Splatting dilation compensation (RasterConfig.antialiasing).

    The reference composites the +0.3px-dilated covariance uncompensated
    (forward.cu:110); AA mode scales opacity by sqrt(det(cov)/det(cov+0.3I)).
    """

    def test_compensation_formula_and_bounds(self):
        cam, (means, scales, q, opacity, features) = make_scene(n=40)
        prep = preprocess(means, scales, q, cam, WIDTH, HEIGHT, 16,
                          opacity=opacity, antialiasing=True)
        comp = np.asarray(prep.compensation)
        valid = np.asarray(prep.valid)
        assert np.all(comp[valid] > 0.0) and np.all(comp[valid] <= 1.0)
        assert np.all(comp[~valid] == 0.0)
        # direct recomputation from the dilated conic: the dilated covariance
        # is the conic's inverse, raw covariance = dilated - 0.3 I
        conic = np.asarray(prep.conic)[valid]
        det_blur = 1.0 / (conic[:, 0] * conic[:, 2] - conic[:, 1] ** 2)
        c_xx = conic[:, 2] * det_blur - 0.3
        c_yy = conic[:, 0] * det_blur - 0.3
        c_xy = -conic[:, 1] * det_blur
        det_raw = c_xx * c_yy - c_xy * c_xy
        np.testing.assert_allclose(comp[valid], np.sqrt(np.maximum(det_raw, 0) / det_blur),
                                   rtol=2e-3)

    def test_aa_render_dimmer_and_converges_to_plain(self):
        cam, (means, scales, q, opacity, features) = make_scene(n=40)
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16)
        cfg_aa = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64,
                              chunk=16, antialiasing=True)
        kw = dict(means3d=means, scales=scales, rotations=q, opacity=opacity,
                  features=features, width=WIDTH, height=HEIGHT)
        plain = render(cam, config=cfg, **kw)
        aa = render(cam, config=cfg_aa, **kw)
        # compensation < 1 => strictly less energy, more transmittance
        assert float(jnp.sum(aa["render"])) < float(jnp.sum(plain["render"]))
        assert float(jnp.mean(aa["final_T"])) > float(jnp.mean(plain["final_T"]))
        # with covariances >> 0.3px the compensation tends to 1: huge splats
        big = render(cam, config=cfg_aa, means3d=means,
                     scales=scales * 40.0, rotations=q, opacity=opacity,
                     features=features, width=WIDTH, height=HEIGHT)
        big_plain = render(cam, config=cfg, means3d=means,
                           scales=scales * 40.0, rotations=q, opacity=opacity,
                           features=features, width=WIDTH, height=HEIGHT)
        np.testing.assert_allclose(np.asarray(big["render"]),
                                   np.asarray(big_plain["render"]), atol=2e-3)

    def test_aa_gradients_flow_to_scales(self):
        cam, (means, scales, q, opacity, features) = make_scene(n=25)
        cfg_aa = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64,
                              chunk=16, antialiasing=True)

        def loss(s):
            out = render(cam, means3d=means, scales=s, rotations=q,
                         opacity=opacity, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg_aa)
            return jnp.sum(out["render"] ** 2)

        g = jax.grad(loss)(scales)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0
        # finite-difference check on one coordinate
        eps = 1e-4
        e = jnp.zeros_like(scales).at[3, 1].set(eps)
        fd = (loss(scales + e) - loss(scales - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[3, 1]), float(fd), rtol=2e-2, atol=1e-3)

    def test_aa_grads_finite_at_degenerate_cov(self):
        """Thin strands cancel to det_raw <= 0; the compensation sqrt must
        never emit NaN gradients there (round-3 advisor finding: the old
        maximum(det_raw, 0) form produced 0*inf in the VJP that no
        downstream where could remove)."""
        cam, (means, scales, q, opacity, features) = make_scene(n=12)
        # force degenerate 2D footprints: one axis collapsed to ~0 (rank-1
        # covariance after projection => det_raw cancels at f32)
        scales = scales.at[:, 1].set(1e-9)
        scales = scales.at[0, :].set(1e-9)  # fully collapsed row too
        cfg_aa = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64,
                              chunk=16, antialiasing=True)

        def loss(ms, sc, qq, op):
            out = render(cam, means3d=ms, scales=sc, rotations=qq,
                         opacity=op, features=features,
                         width=WIDTH, height=HEIGHT, config=cfg_aa)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"])

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, q, opacity)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g))), "NaN/Inf in AA gradients"

    def test_aa_pallas_matches_xla(self):
        cam, (means, scales, q, opacity, features) = make_scene(n=40)
        kw = dict(means3d=means, scales=scales, rotations=q, opacity=opacity,
                  features=features, width=WIDTH, height=HEIGHT)
        out_x = render(cam, config=RasterConfig(
            max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16,
            antialiasing=True), **kw)
        out_p = render(cam, config=RasterConfig(
            max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16,
            use_pallas=True, antialiasing=True), **kw)
        np.testing.assert_allclose(np.asarray(out_p["render"]),
                                   np.asarray(out_x["render"]), atol=2e-5)
