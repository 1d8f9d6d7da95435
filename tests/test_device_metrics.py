"""Device-side metric parity vs the host scipy oracle (ROADMAP item 12).

The chunked masked ball-query matmuls must reproduce the host
`pct_matched_points` matched fractions exactly (set membership, not a
numeric approximation) including padding/validity masks and the
bidirectional angle convention (min(dth, pi-dth), loss/metrics.py:28,53-56).
"""

import numpy as np
import jax.numpy as jnp

from hairgs_tpu.evaluation.device_metrics import (
    compute_metrics_device,
    matched_fraction,
    matched_mask,
)
from hairgs_tpu.evaluation.metrics import compute_metrics, pct_matched_points
from hairgs_tpu.io.npz import HairEvalData


def random_cloud(n, seed, spread=0.05):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sid = rng.integers(0, max(n // 10, 1), n)
    return HairEvalData(points=pts, directions=dirs,
                        points_id_to_strand_id=sid, edges=None)


class TestMatchedMask:
    def test_matches_host_oracle(self):
        p1 = random_cloud(403, 0)
        p2 = random_cloud(517, 1)
        for dist_th, angle_th in [(2e-3, 20), (4e-3, 40), (4e-3, 90)]:
            for bidir in (False, True):
                host, _ = pct_matched_points(p1, p2, dist_th, angle_th, bidir)
                dev = matched_fraction(
                    jnp.asarray(p1.points), jnp.asarray(p1.directions),
                    jnp.asarray(p2.points), jnp.asarray(p2.directions),
                    dist_th, angle_th, bidirectional=bidir,
                    q_chunk=128, p_chunk=256)
                assert abs(float(dev) - host) < 1e-6, (dist_th, angle_th, bidir)

    def test_validity_masks_exclude_padding(self):
        p1 = random_cloud(100, 2)
        p2 = random_cloud(120, 3)
        # pad both clouds with garbage rows that would otherwise match
        pad1 = np.concatenate([p1.points, p2.points[:20]], axis=0)
        padd1 = np.concatenate([p1.directions, p2.directions[:20]], axis=0)
        v1 = np.concatenate([np.ones(100, bool), np.zeros(20, bool)])
        pad2 = np.concatenate([p2.points, p1.points[:30]], axis=0)
        padd2 = np.concatenate([p2.directions, p1.directions[:30]], axis=0)
        v2 = np.concatenate([np.ones(120, bool), np.zeros(30, bool)])
        host, _ = pct_matched_points(p1, p2, 4e-3, 40, True)
        dev = matched_fraction(
            jnp.asarray(pad1), jnp.asarray(padd1),
            jnp.asarray(pad2), jnp.asarray(padd2),
            4e-3, 40, valid1=jnp.asarray(v1), valid2=jnp.asarray(v2),
            bidirectional=True, q_chunk=64, p_chunk=64)
        assert abs(float(dev) - host) < 1e-6

    def test_mask_identity_self_match(self):
        p = random_cloud(64, 4)
        m = matched_mask(
            jnp.asarray(p.points), jnp.asarray(p.directions),
            jnp.asarray(p.points), jnp.asarray(p.directions),
            jnp.float32(1e-6), jnp.float32(0.99), q_chunk=32, p_chunk=32)
        assert bool(jnp.all(m))


class TestDeviceEvalExtractors:
    def test_gaussian_extractor_matches_host_converter(self):
        from hairgs_tpu.evaluation.eval_data import (
            compute_eval_data_from_gaussian,
            eval_points_device_from_gaussian,
        )
        from hairgs_tpu.models.gaussian import GaussianModel

        rng = np.random.default_rng(11)
        n = 50
        pts = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
        colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        model = GaussianModel(sh_degree=0, capacity_round=64)
        model.create_from_pcd(pts, colors)
        host = compute_eval_data_from_gaussian(model)
        dpts, ddirs, dvalid = eval_points_device_from_gaussian(model)
        v = np.asarray(dvalid)
        np.testing.assert_allclose(np.asarray(dpts)[v], host.points, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ddirs)[v], host.directions,
                                   atol=1e-6)


class TestHairDeviceExtractor:
    def test_hair_extractor_matches_host_set(self):
        from hairgs_tpu.evaluation.eval_data import (
            compute_eval_data_from_hair,
            eval_points_device_from_hair,
        )
        from tests.test_topo import make_hair_model, two_strands

        eps, pairs = two_strands()
        model = make_hair_model(eps, pairs)
        host = compute_eval_data_from_hair(model)
        dpts, ddirs, dvalid = eval_points_device_from_hair(model)
        v = np.asarray(dvalid)
        dev_pts = np.asarray(dpts)[v]
        # same point SET (host orders by strand; sort both lexicographically)
        host_sorted = host.points[np.lexsort(host.points.T)]
        dev_sorted = dev_pts[np.lexsort(dev_pts.T)]
        np.testing.assert_allclose(dev_sorted, host_sorted, atol=1e-6)


class TestComputeMetricsDevice:
    def test_threshold_grid_matches_host(self):
        pred = random_cloud(350, 5)
        gt = random_cloud(280, 6)
        host, host_th = compute_metrics(
            pred, gt, bidirectional=True,
            metrics=("precision", "recall", "f1"))
        dev, dev_th = compute_metrics_device(
            jnp.asarray(pred.points), jnp.asarray(pred.directions),
            jnp.asarray(gt.points), jnp.asarray(gt.directions),
            bidirectional=True, q_chunk=128, p_chunk=128)
        assert host_th == dev_th
        for k in ("precision(b)", "recall(b)", "f1(b)"):
            np.testing.assert_allclose(dev[k], host[k], atol=1e-6)
