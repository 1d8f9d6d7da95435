"""Vectorized metric parity + USC-scale runtime.

Oracle: a literal transcription of the reference's per-point loop
(loss/metrics.py:12-85) — dict-of-votes strand consistency included.
"""

import time

import numpy as np
import pytest
from scipy.spatial import cKDTree

from hairgs_tpu.evaluation.metrics import compute_metrics, pct_matched_points
from hairgs_tpu.io.npz import HairEvalData


def _oracle_pct_matched(p1, p2, dist_th, angle_th, bidirectional,
                        compute_strand_consistency):
    """Reference semantics, point-by-point (loss/metrics.py:12-85)."""
    cos_th = np.cos(np.deg2rad(angle_th))
    tree = cKDTree(p2.points)
    lists = tree.query_ball_point(p1.points, r=dist_th)
    matched = 0
    votes = {}
    for i, nn in enumerate(lists):
        if not nn:
            continue
        dots = p1.directions[i] @ p2.directions[np.asarray(nn)].T
        if bidirectional:
            dots = np.abs(dots)
        ok = np.asarray(nn)[dots >= cos_th]
        if ok.size:
            matched += 1
            if compute_strand_consistency:
                sid = p1.points_id_to_strand_id[i]
                votes.setdefault(sid, []).extend(
                    np.unique(p2.points_id_to_strand_id[ok]).tolist()
                )
    ratio = matched / p1.points.shape[0]
    sc = None
    if compute_strand_consistency:
        sids, counts = np.unique(p1.points_id_to_strand_id, return_counts=True)
        total = 0.0
        for sid, cnt in zip(sids, counts):
            v = votes.get(sid, [])
            if v:
                _, c = np.unique(np.asarray(v), return_counts=True)
                total += c.max() / cnt
        sc = total / len(sids)
    return ratio, sc


def random_cloud(n_strands, pts_per_strand, seed, scale=0.05):
    rng = np.random.default_rng(seed)
    roots = rng.normal(0, scale, (n_strands, 3))
    step = rng.normal(0, 0.002, (n_strands, pts_per_strand, 3))
    pts = (roots[:, None] + np.cumsum(step, axis=1)).reshape(-1, 3)
    dirs = rng.normal(0, 1, (n_strands * pts_per_strand, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sid = np.repeat(np.arange(n_strands), pts_per_strand)
    return HairEvalData(points=pts.astype(np.float32),
                        directions=dirs.astype(np.float32),
                        points_id_to_strand_id=sid, edges=None)


class TestVectorizedParity:
    @pytest.mark.parametrize("bidirectional", [False, True])
    def test_matches_oracle(self, bidirectional):
        p1 = random_cloud(40, 12, seed=1)
        p2 = random_cloud(35, 12, seed=2)
        for dist_th, angle_th in [(2e-3, 20), (4e-3, 40), (4e-3, 90)]:
            want = _oracle_pct_matched(p1, p2, dist_th, angle_th,
                                       bidirectional, True)
            got = pct_matched_points(p1, p2, dist_th, angle_th,
                                     bidirectional, True)
            assert abs(got[0] - want[0]) < 1e-12
            assert abs(got[1] - want[1]) < 1e-12

    def test_chunked_equals_unchunked(self):
        p1 = random_cloud(60, 10, seed=3)
        p2 = random_cloud(60, 10, seed=4)
        a = pct_matched_points(p1, p2, 3e-3, 30, True, True, chunk=73)
        b = pct_matched_points(p1, p2, 3e-3, 30, True, True)
        assert a == b

    @pytest.mark.parametrize("dist_ths,angle_ths", [
        ([2e-3, 3e-3, 4e-3, 4e-3], [20, 30, 40, 90]),  # default nested grid
        ([4e-3, 2e-3, 3e-3], [20, 90, 30]),            # non-nested fallback
    ])
    def test_multi_threshold_matches_oracle(self, dist_ths, angle_ths):
        from hairgs_tpu.evaluation.metrics import pct_matched_points_multi
        p1 = random_cloud(40, 12, seed=9)
        p2 = random_cloud(35, 12, seed=10)
        ratios, scs = pct_matched_points_multi(
            p1, p2, dist_ths, angle_ths, bidirectional=True,
            compute_strand_consistency=True)
        for t, (d, a) in enumerate(zip(dist_ths, angle_ths)):
            want = _oracle_pct_matched(p1, p2, d, a, True, True)
            assert abs(ratios[t] - want[0]) < 1e-12
            assert abs(scs[t] - want[1]) < 1e-12

    def test_non_contiguous_strand_ids(self):
        p1 = random_cloud(20, 8, seed=5)
        p2 = random_cloud(20, 8, seed=6)
        # sparse, shuffled ids exercise the unique/inverse mapping
        p1 = p1._replace(points_id_to_strand_id=p1.points_id_to_strand_id * 17 + 3)
        p2 = p2._replace(points_id_to_strand_id=p2.points_id_to_strand_id * 11 + 5)
        want = _oracle_pct_matched(p1, p2, 4e-3, 40, True, True)
        got = pct_matched_points(p1, p2, 4e-3, 40, True, True)
        assert abs(got[0] - want[0]) < 1e-12
        assert abs(got[1] - want[1]) < 1e-12


class TestUSCScale:
    def test_full_usc_size_in_seconds(self):
        # USC-HairSalon scale: 10000 strands x 99 points = 990k points each
        # side (data/hair_data.py:82-88). The reference needs a Pool(8) here;
        # the vectorized path must do the full 4-threshold bidirectional
        # metric set single-process in well under a minute.
        gt = random_cloud(10_000, 99, seed=7, scale=0.08)
        pred = random_cloud(10_000, 99, seed=8, scale=0.08)
        t0 = time.perf_counter()
        metrics, ths = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        dt = time.perf_counter() - t0
        assert len(ths) == 4
        for v in metrics.values():
            assert np.all(np.isfinite(v))
        assert dt < 120, f"USC-scale eval took {dt:.1f}s"
