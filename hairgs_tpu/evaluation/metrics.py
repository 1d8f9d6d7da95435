"""Oriented-point-cloud reconstruction metrics.

Parity target: loss/metrics.py:12-173 — precision / recall / F1 / strand
consistency at paired (distance, angle) thresholds (2mm,20°), (3mm,30°),
(4mm,40°), (4mm,90°), with optional bidirectional angle matching.

The per-point matching loop is vectorized here (the reference iterates point
by point over cKDTree ball-query results, parallelized with a process pool of
8, loss/metrics.py:113-149); results are identical, and the vectorized form
is fast enough single-process. `processes` is accepted for signature parity.
"""

from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

from hairgs_tpu.io.npz import HairEvalData

DEFAULT_DIST_THS = [2e-3, 3e-3, 4e-3, 4e-3]
DEFAULT_ANGLE_THS = [20, 30, 40, 90]


def pct_matched_points(
    p1: HairEvalData,
    p2: HairEvalData,
    dist_th: float,
    angle_th: float,
    bidirectional: bool = False,
    compute_strand_consistency: bool = False,
) -> Tuple[float, Optional[float]]:
    """Fraction of p1 points with a (distance, angle)-matched point in p2;
    optionally the strand-consistency score (loss/metrics.py:12-85)."""
    cos_sim_th = np.cos(np.deg2rad(angle_th))
    n_points = p1.points.shape[0]
    tree = cKDTree(p2.points)
    neighbor_lists = tree.query_ball_point(p1.points, r=dist_th, workers=-1)

    counts = np.fromiter((len(nn) for nn in neighbor_lists), dtype=np.int64,
                         count=n_points)
    flat_nn = np.concatenate(
        [np.asarray(nn, dtype=np.int64) for nn in neighbor_lists if len(nn)]
    ) if counts.sum() else np.zeros(0, dtype=np.int64)
    owner = np.repeat(np.arange(n_points), counts)

    dots = np.einsum("ij,ij->i", p1.directions[owner], p2.directions[flat_nn])
    if bidirectional:
        dots = np.abs(dots)
    good = dots >= cos_sim_th
    matched_per_point = np.zeros(n_points, dtype=bool)
    np.logical_or.at(matched_per_point, owner[good], True)
    matching_ratio = matched_per_point.sum() / n_points

    strand_ratio = None
    if compute_strand_consistency:
        # per matched p1 point: the set of p2 strand ids it matched; per p1
        # strand: max vote share of a single p2 strand
        p1_strand = p1.points_id_to_strand_id
        p2_strand = p2.points_id_to_strand_id
        num_strands = len(np.unique(p1_strand))
        strand_points = {}
        votes = {}
        for sid, cnt in zip(*np.unique(p1_strand, return_counts=True)):
            strand_points[sid] = cnt
            votes[sid] = []
        # unique matched (p1 point, p2 strand) pairs — the reference extends
        # with np.unique per point (l.65-68), i.e. one vote per (point, strand)
        if good.any():
            ow = owner[good]
            ms = p2_strand[flat_nn[good]]
            pairs = np.unique(np.stack([ow, ms], axis=1), axis=0)
            for pt, s2 in pairs:
                votes[p1_strand[pt]].append(s2)
        total = 0.0
        for sid, cnt in strand_points.items():
            v = votes[sid]
            if v:
                _, c = np.unique(np.asarray(v), return_counts=True)
                total += c.max() / cnt
        strand_ratio = total / num_strands
    return float(matching_ratio), strand_ratio


def compute_metrics(
    pred: HairEvalData,
    gt: HairEvalData,
    dist_ths: List[float] = DEFAULT_DIST_THS,
    angle_ths: List[float] = DEFAULT_ANGLE_THS,
    metrics: List[str] = ("precision", "recall", "f1", "strand_consistency"),
    bidirectional: bool = False,
    processes: Optional[int] = None,
    return_table: bool = False,
):
    """Metric dict keyed like the reference (suffix "(b)" when bidirectional),
    values = arrays over thresholds; plus the threshold labels.

    With return_table=True additionally returns a printable table (the
    reference eval.py:56-59 expects this but metrics.py never implemented it —
    fixed here)."""
    del processes  # vectorized implementation; kept for signature parity
    compute_sc = (
        "strand_consistency" in metrics
        and pred.points_id_to_strand_id is not None
        and gt.points_id_to_strand_id is not None
    )
    thresholds = [f"{d}m&{a}°" for d, a in zip(dist_ths, angle_ths)]
    out: Dict[str, list] = {m: [] for m in metrics}
    for d, a in zip(dist_ths, angle_ths):
        if "precision" in metrics:
            p, _ = pct_matched_points(pred, gt, d, a, bidirectional, False)
            out["precision"].append(p)
        if "recall" in metrics:
            r, sc = pct_matched_points(gt, pred, d, a, bidirectional, compute_sc)
            out["recall"].append(r)
            if compute_sc:
                out["strand_consistency"].append(sc)
        if "f1" in metrics and "precision" in metrics and "recall" in metrics:
            p, r = out["precision"][-1], out["recall"][-1]
            out["f1"].append(2 * p * r / (p + r) if (p + r) > 0 else 0.0)

    suffix = "(b)" if bidirectional else ""
    final = {
        (k + suffix): np.asarray(v) for k, v in out.items() if len(v)
    }
    if return_table:
        return final, thresholds, format_metric_table(final, thresholds)
    return final, thresholds


def format_metric_table(metric_dict: Dict[str, np.ndarray], thresholds: List[str]) -> str:
    name_w = max(len(k) for k in metric_dict) if metric_dict else 8
    header = " " * (name_w + 2) + "  ".join(f"{t:>14}" for t in thresholds)
    lines = [header]
    for k, v in metric_dict.items():
        lines.append(f"{k:<{name_w}}  " + "  ".join(f"{x:>14.4f}" for x in v))
    return "\n".join(lines)
