"""Secondary renderer paths: cov3D-precompute A/B oracle, scale modifier,
background on the pallas path, resolution policy."""

import dataclasses
import numpy as np
import jax.numpy as jnp

from hairgs_tpu.render import render, RasterConfig
from hairgs_tpu.render.preprocess import compute_cov3d
from hairgs_tpu.io.dataset import _resolve_resolution
from tests.test_render import WIDTH, HEIGHT, make_scene

CFG = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=64, chunk=16)


class TestCov3DPrecompute:
    def test_precomputed_covariance_matches_scales_rotations(self):
        """The reference exposes compute_cov3D_python as a live A/B oracle for
        the kernels (gaussian_renderer/__init__.py:82-104); both paths must
        render identically."""
        scene = make_scene(n=40)
        cam, (means, scales, q, opacity, features) = scene
        out_a = render(cam, means3d=means, scales=scales, rotations=q,
                       opacity=opacity, features=features,
                       width=WIDTH, height=HEIGHT, config=CFG)
        cov3d = compute_cov3d(scales, q)
        out_b = render(cam, means3d=means, cov3d_precomp=cov3d,
                       opacity=opacity, features=features,
                       width=WIDTH, height=HEIGHT, config=CFG)
        np.testing.assert_allclose(np.asarray(out_a["render"]),
                                   np.asarray(out_b["render"]), atol=1e-5)

    def test_scale_modifier(self):
        """scale_modifier m scales the covariance like pre-scaled inputs
        (computeCov3D applies mod*scale, forward.cu:121-124)."""
        scene = make_scene(n=25)
        cam, (means, scales, q, opacity, features) = scene
        out_a = render(cam, means3d=means, scales=scales, rotations=q,
                       opacity=opacity, features=features, scale_modifier=0.5,
                       width=WIDTH, height=HEIGHT, config=CFG)
        out_b = render(cam, means3d=means, scales=scales * 0.5, rotations=q,
                       opacity=opacity, features=features,
                       width=WIDTH, height=HEIGHT, config=CFG)
        np.testing.assert_allclose(np.asarray(out_a["render"]),
                                   np.asarray(out_b["render"]), atol=1e-5)


class TestPallasBackground:
    def test_bg_composited_on_both_outputs(self):
        scene = make_scene(n=20)
        cam, (means, scales, q, opacity, features) = scene
        bg = jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0, 0.0, 0.0][: features.shape[1]])
        cfg = dataclasses.replace(CFG, use_pallas=True)
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features, bg=bg,
                     width=WIDTH, height=HEIGHT, config=cfg)
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   np.asarray(out["render_photo"]), atol=1e-6)
        out_x = render(cam, means3d=means, scales=scales, rotations=q,
                       opacity=opacity, features=features, bg=bg,
                       width=WIDTH, height=HEIGHT, config=CFG)
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   np.asarray(out_x["render"]), atol=3e-5)


class TestResolutionPolicy:
    def test_divisor_modes(self):
        assert _resolve_resolution(1600, 1200, 2, 1.0) == (800, 600)
        assert _resolve_resolution(1600, 1200, 4, 1.0) == (400, 300)

    def test_auto_cap_1600(self):
        w, h = _resolve_resolution(3200, 2400, -1, 1.0)
        assert w == 1600 and h == 1200

    def test_auto_no_cap_below_1600(self):
        assert _resolve_resolution(1000, 800, -1, 1.0) == (1000, 800)

    def test_explicit_width(self):
        w, h = _resolve_resolution(1000, 800, 500, 1.0)
        assert w == 500 and h == 400

    def test_resolution_scale(self):
        w, h = _resolve_resolution(1000, 800, 1, 2.0)
        assert (w, h) == (500, 400)


class TestAnisotropicTileCull:
    """Exact alpha-bound tile culling (binning._tile_min_power): for the
    elongated footprints of hair segments it must drop a large share of the
    3σ-square candidate tiles while leaving the render bit-unchanged (every
    dropped tile fails the compositor's ALPHA_MIN gate on all pixels)."""

    def _thin_scene(self, n=30, seed=11):
        from hairgs_tpu.core.camera import make_camera
        rng = np.random.default_rng(seed)
        means = np.zeros((n, 3), np.float32)
        means[:, 0] = rng.uniform(-0.4, 0.4, n)
        means[:, 1] = rng.uniform(-0.4, 0.4, n)
        means[:, 2] = rng.uniform(2.0, 3.0, n)
        # hair-segment-like: one long axis, two thin, random orientation
        scales = np.tile(np.array([[0.25, 5e-4, 5e-4]], np.float32), (n, 1))
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        opacity = rng.uniform(0.3, 0.9, n).astype(np.float32)
        features = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=1.0)
        return cam, (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                     jnp.asarray(opacity), jnp.asarray(features))

    def test_culls_many_pairs_exactly(self):
        import jax
        from hairgs_tpu.render.binning import bin_gaussians_sorted
        from hairgs_tpu.render.composite import composite_naive
        from hairgs_tpu.render.preprocess import preprocess

        cam, (means, scales, q, opacity, features) = self._thin_scene()
        cfg = dataclasses.replace(CFG, max_tiles_per_gaussian=64,
                                  max_pairs_per_tile=256)
        ts = cfg.tile_size
        gw = (WIDTH + ts - 1) // ts
        gh = (HEIGHT + ts - 1) // ts

        prep = preprocess(means, scales, q, cam, WIDTH, HEIGHT, ts,
                          opacity=opacity)
        q_cut = jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)
        b_cull = bin_gaussians_sorted(
            prep.rect, prep.depth, prep.valid, gw, gh,
            cfg.max_tiles_per_gaussian, cfg.max_pairs_per_tile, cfg.chunk,
            xy=prep.xy, conic=prep.conic, q_cut=q_cut, tile_size=ts)
        b_nocull = bin_gaussians_sorted(
            prep.rect, prep.depth, prep.valid, gw, gh,
            cfg.max_tiles_per_gaussian, cfg.max_pairs_per_tile, cfg.chunk)
        kept = int(jnp.sum(b_cull.counts))
        kept_nocull = int(jnp.sum(b_nocull.counts))
        assert kept < 0.6 * kept_nocull, (kept, kept_nocull)

        # exactness: the culled tiled render equals the un-culled oracle
        out = render(cam, means3d=means, scales=scales, rotations=q,
                     opacity=opacity, features=features,
                     width=WIDTH, height=HEIGHT, config=cfg)
        prep3 = preprocess(means, scales, q, cam, WIDTH, HEIGHT, ts)
        img_naive, _ = composite_naive(
            prep3.xy, prep3.conic, opacity, features, prep3.depth,
            prep3.valid, WIDTH, HEIGHT, rect=prep3.rect)
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   np.asarray(img_naive), atol=3e-5)


