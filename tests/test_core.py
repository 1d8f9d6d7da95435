import numpy as np
import jax.numpy as jnp
import pytest

from hairgs_tpu.core import (
    build_rotation,
    build_scaling_rotation,
    strip_symmetric,
    rotation_between_vectors,
    matrix_to_quaternion,
    eval_sh,
    RGB2SH,
    SH2RGB,
    expon_lr,
    pval_to_dist_to_scale_factor,
    dist_to_scale_factor_to_pval,
)
from hairgs_tpu.core.transforms import quaternion_between_vectors
from hairgs_tpu.core.camera import (
    world_to_view,
    projection_matrix,
    fov2focal,
    focal2fov,
    make_camera,
)


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


class TestRotations:
    def test_build_rotation_orthonormal(self):
        q = random_quats(32)
        R = np.asarray(build_rotation(jnp.asarray(q, dtype=jnp.float32)))
        eye = np.eye(3)
        for r in R:
            np.testing.assert_allclose(r @ r.T, eye, atol=1e-5)
            assert np.linalg.det(r) > 0.99

    def test_build_rotation_identity(self):
        R = np.asarray(build_rotation(jnp.asarray([[1.0, 0, 0, 0]])))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_build_rotation_z90(self):
        # 90 deg about z: w=cos45, z=sin45
        s = np.sin(np.pi / 4)
        R = np.asarray(build_rotation(jnp.asarray([[np.cos(np.pi / 4), 0, 0, s]], dtype=jnp.float32)))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(R[0], expected, atol=1e-6)

    def test_matrix_quaternion_roundtrip(self):
        q = random_quats(64)
        q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
        R = build_rotation(jnp.asarray(q, dtype=jnp.float32))
        q2 = np.asarray(matrix_to_quaternion(R))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_rotation_between_vectors(self):
        rng = np.random.default_rng(1)
        v2 = rng.normal(size=(16, 3)).astype(np.float32)
        v1 = np.tile(np.array([[1.0, 0, 0]], dtype=np.float32), (16, 1))
        R = np.asarray(rotation_between_vectors(jnp.asarray(v1), jnp.asarray(v2)))
        v2n = v2 / np.linalg.norm(v2, axis=1, keepdims=True)
        rotated = np.einsum("nij,nj->ni", R, v1)
        np.testing.assert_allclose(rotated, v2n, atol=1e-4)

    def test_quaternion_between_vectors_matches_matrix(self):
        rng = np.random.default_rng(2)
        v2 = rng.normal(size=(8, 3)).astype(np.float32)
        v1 = np.tile(np.array([[1.0, 0, 0]], dtype=np.float32), (8, 1))
        q = quaternion_between_vectors(jnp.asarray(v1), jnp.asarray(v2))
        Rq = np.asarray(build_rotation(q))
        Rm = np.asarray(rotation_between_vectors(jnp.asarray(v1), jnp.asarray(v2)))
        np.testing.assert_allclose(Rq, Rm, atol=1e-4)

    def test_build_scaling_rotation_covariance(self):
        q = random_quats(8)
        s = np.abs(np.random.default_rng(3).normal(size=(8, 3))).astype(np.float32) + 0.1
        L = build_scaling_rotation(jnp.asarray(s), jnp.asarray(q, dtype=jnp.float32))
        cov = np.asarray(L @ jnp.swapaxes(L, -1, -2))
        # eigenvalues of cov = s^2
        for i in range(8):
            ev = np.sort(np.linalg.eigvalsh(cov[i]))
            np.testing.assert_allclose(ev, np.sort(s[i] ** 2), rtol=1e-4, atol=1e-5)

    def test_strip_symmetric(self):
        m = jnp.asarray(np.arange(9, dtype=np.float32).reshape(1, 3, 3))
        out = np.asarray(strip_symmetric(m))[0]
        np.testing.assert_array_equal(out, [0, 1, 2, 4, 5, 8])


class TestSH:
    def test_deg0_constant(self):
        sh = jnp.ones((5, 3, 1))
        dirs = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
        out = np.asarray(eval_sh(0, sh, dirs))
        np.testing.assert_allclose(out, 0.28209479177387814, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(np.asarray(SH2RGB(RGB2SH(rgb))), np.asarray(rgb), rtol=1e-6)

    def test_deg1_linear(self):
        # degree-1 term for y channel: -C1 * y * sh1
        sh = np.zeros((1, 1, 4), dtype=np.float32)
        sh[0, 0, 1] = 2.0
        dirs = jnp.asarray([[0.0, 1.0, 0.0]])
        out = float(eval_sh(1, jnp.asarray(sh), dirs)[0, 0])
        np.testing.assert_allclose(out, -0.4886025119029199 * 2.0, rtol=1e-6)


class TestSchedules:
    def test_expon_lr_endpoints(self):
        lr0 = float(expon_lr(0, 1e-2, 1e-4, max_steps=100))
        lrN = float(expon_lr(100, 1e-2, 1e-4, max_steps=100))
        np.testing.assert_allclose(lr0, 1e-2, rtol=1e-5)
        np.testing.assert_allclose(lrN, 1e-4, rtol=1e-5)

    def test_expon_lr_log_linear(self):
        mid = float(expon_lr(50, 1e-2, 1e-4, max_steps=100))
        np.testing.assert_allclose(mid, 1e-3, rtol=1e-5)

    def test_negative_step_zero(self):
        assert float(expon_lr(-1, 1e-2, 1e-4, max_steps=100)) == 0.0

    def test_delay(self):
        # matches reference utils/general.py:57-62 behavior at step 0
        lr = float(expon_lr(0, 1e-2, 1e-4, lr_delay_steps=10, lr_delay_mult=0.1, max_steps=100))
        np.testing.assert_allclose(lr, 1e-3, rtol=1e-5)


class TestPval:
    def test_reference_value(self):
        # scene/gaussian_model.py:35: pval 0.05 -> 0.5102133812190369
        np.testing.assert_allclose(
            pval_to_dist_to_scale_factor(0.05), 0.5102133812190369, rtol=1e-6
        )

    def test_roundtrip(self):
        f = pval_to_dist_to_scale_factor(0.1)
        np.testing.assert_allclose(dist_to_scale_factor_to_pval(f), 0.1, rtol=1e-6)


class TestCamera:
    def test_fov_focal_roundtrip(self):
        f = fov2focal(1.2, 800)
        np.testing.assert_allclose(focal2fov(f, 800), 1.2, rtol=1e-9)

    def test_world_to_view_identity(self):
        w2v = world_to_view(np.eye(3), np.zeros(3))
        np.testing.assert_allclose(w2v, np.eye(4), atol=1e-6)

    def test_world_to_view_roundtrip_center(self):
        rng = np.random.default_rng(0)
        # random rotation via QR
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        t = rng.normal(size=3)
        w2v = world_to_view(Q, t)
        center = np.linalg.inv(w2v)[:3, 3]
        # camera center maps to origin in view space
        v = w2v @ np.append(center, 1.0)
        np.testing.assert_allclose(v[:3], 0, atol=1e-5)

    def test_projection_matrix_znear_maps_to_zero(self):
        P = projection_matrix(0.01, 100.0, 1.0, 1.0)
        p = P @ np.array([0, 0, 0.01, 1.0])
        np.testing.assert_allclose(p[2] / p[3], 0.0, atol=1e-6)
        p = P @ np.array([0, 0, 100.0, 1.0])
        np.testing.assert_allclose(p[2] / p[3], 1.0, atol=1e-5)

    def test_make_camera_center(self):
        rng = np.random.default_rng(4)
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        t = rng.normal(size=3)
        cam = make_camera(Q, t, 1.0, 1.0)
        w2v = np.asarray(cam.world_view)
        np.testing.assert_allclose(
            np.asarray(cam.cam_center), np.linalg.inv(w2v)[:3, 3], atol=1e-5
        )
