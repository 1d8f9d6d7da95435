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
