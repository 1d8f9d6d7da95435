"""Numerical parity against torch (the reference stack's numerics).

These pin the framework's core math to the exact operators the reference
uses: windowed SSIM, BCEWithLogitsLoss, torch.optim.Adam, quaternion
rotations, and the exponential-LR schedule shape.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")


class TestSSIMTorchParity:
    def _torch_ssim(self, a, b, window_size=11, sigma=1.5):
        """Reference SSIM (loss/losses.py:24-84) on CHW torch tensors."""
        import torch.nn.functional as F

        g = torch.tensor(
            [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
             for x in range(window_size)]
        )
        g = (g / g.sum()).unsqueeze(1)
        w = (g @ g.t()).float().unsqueeze(0).unsqueeze(0)
        c = a.size(0)
        w = w.expand(c, 1, window_size, window_size).contiguous()
        pad = window_size // 2

        def f(x):
            return F.conv2d(x.unsqueeze(0), w, padding=pad, groups=c)[0]

        mu1, mu2 = f(a), f(b)
        s1 = f(a * a) - mu1**2
        s2 = f(b * b) - mu2**2
        s12 = f(a * b) - mu1 * mu2
        C1, C2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
            (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
        )
        return float(m.mean())

    def test_ssim_matches_reference_torch(self):
        from hairgs_tpu.ops.ssim import ssim

        rng = np.random.default_rng(0)
        a = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = self._torch_ssim(
            torch.from_numpy(a.transpose(2, 0, 1)),
            torch.from_numpy(b.transpose(2, 0, 1)),
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestBCETorchParity:
    def test_bce_with_logits(self):
        from hairgs_tpu.losses.photometric import bce_with_logits

        rng = np.random.default_rng(1)
        logits = rng.normal(0, 3, (64, 64)).astype(np.float32)
        targets = (rng.uniform(0, 1, (64, 64)) > 0.5).astype(np.float32)
        ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
        theirs = float(torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(logits), torch.from_numpy(targets)
        ))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


class TestAdamTorchParity:
    def test_multi_step_trajectory(self):
        """Our Adam must track torch.optim.Adam (the reference optimizer,
        eps=1e-15) over many steps with varying gradients."""
        from hairgs_tpu.optim import adam_init, adam_step

        rng = np.random.default_rng(2)
        p0 = rng.normal(size=(16, 3)).astype(np.float32)
        lr = 0.01

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)

        jp = jnp.asarray(p0)
        state = adam_init(jp)
        for step in range(20):
            g = rng.normal(size=(16, 3)).astype(np.float32)
            topt.zero_grad()
            tp.grad = torch.from_numpy(g.copy())
            topt.step()
            jp, state = adam_step(jp, jnp.asarray(g), state, lr)
        np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                   rtol=1e-4, atol=1e-6)


class TestQuaternionTorchParity:
    def test_build_rotation_matches_reference_formula(self):
        """Quaternion->matrix must match the reference's build_rotation
        (utils/transform.py:7-30) evaluated in torch."""
        from hairgs_tpu.core.transforms import build_rotation

        rng = np.random.default_rng(3)
        q = rng.normal(size=(32, 4)).astype(np.float32)

        tq = torch.from_numpy(q)
        norm = torch.sqrt((tq * tq).sum(dim=1, keepdim=True))
        nq = tq / norm
        r, x, y, z = nq[:, 0], nq[:, 1], nq[:, 2], nq[:, 3]
        R = torch.zeros((32, 3, 3))
        R[:, 0, 0] = 1 - 2 * (y * y + z * z)
        R[:, 0, 1] = 2 * (x * y - r * z)
        R[:, 0, 2] = 2 * (x * z + r * y)
        R[:, 1, 0] = 2 * (x * y + r * z)
        R[:, 1, 1] = 1 - 2 * (x * x + z * z)
        R[:, 1, 2] = 2 * (y * z - r * x)
        R[:, 2, 0] = 2 * (x * z - r * y)
        R[:, 2, 1] = 2 * (y * z + r * x)
        R[:, 2, 2] = 1 - 2 * (x * x + y * y)

        ours = np.asarray(build_rotation(jnp.asarray(q)))
        np.testing.assert_allclose(ours, R.numpy(), atol=1e-5)


class TestHairCheckpoint:
    def test_full_state_roundtrip(self, tmp_path):
        from tests.test_topo import make_hair_model, two_strands
        from hairgs_tpu.models.hair import HairModel

        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        import jax.numpy as jnp

        m.opt_state = m.opt_state._replace(
            mu=m.opt_state.mu._replace(endpoints=m.opt_state.mu.endpoints + 0.25),
            step=jnp.asarray(11, jnp.int32),
        )
        path = str(tmp_path / "hair_ckpt.npz")
        m.save_checkpoint(path)
        m2 = HairModel(sh_degree=0, capacity_round=64)
        m2.load_checkpoint(path)
        assert m2.num_segments == m.num_segments
        assert int(m2.opt_state.step) == 11
        a1, a2 = m.host_arrays(), m2.host_arrays()
        np.testing.assert_allclose(a1["endpoints"], a2["endpoints"])
        np.testing.assert_array_equal(a1["endpoint_pairs"], a2["endpoint_pairs"])
        np.testing.assert_allclose(
            np.asarray(m2.opt_state.mu.endpoints)[: m.num_endpoints],
            np.asarray(m.opt_state.mu.endpoints)[: m.num_endpoints],
        )
        assert len(m2.strands_info.list_strands) == 2
