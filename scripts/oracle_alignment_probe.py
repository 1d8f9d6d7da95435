#!/usr/bin/env python
"""Oracle-alignment probe: how much coherent position motion does a
checkpoint need to recover F1?

Round-4 forensics (BASELINE.md) showed the Stage-III precision failure is
fine misalignment — the mass of predicted segment points sits just outside
the 4mm gate. The corrective `polish_lr` leg attacks this with a real
position LR and no densification. This probe bounds what that leg can
achieve: it moves every predicted point toward its nearest GT point by a
capped step (the "oracle" direction a perfect photometric gradient would
supply) and re-scores F1(b) @4mm,90°. If a 1-3mm capped oracle move crosses
the 0.518 post-merge score, the leg's premise is sound; the cap at which
F1 saturates also tells us whether directions (not positions) become the
binding gate.

Usage:
  python scripts/oracle_alignment_probe.py \
      --data _runs/syn150_512/data \
      --ply _runs/syn150_512/model/point_cloud/iteration_30017/point_cloud.ply

Pure-CPU, no jax tracing beyond checkpoint loading (~1 min).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="_runs/syn150_512/data")
    ap.add_argument(
        "--ply",
        default="_runs/syn150_512/model/point_cloud/iteration_30017/point_cloud.ply",
    )
    ap.add_argument("--dist_th", type=float, default=0.004)
    ap.add_argument("--angle_th", type=float, default=90.0)
    ap.add_argument(
        "--caps_mm", type=float, nargs="+",
        default=[0.0, 0.5, 1.0, 2.0, 3.0, 4.0, 8.0, 1e9],
        help="max oracle displacement per point, millimetres (1e9 = snap)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from scipy.spatial import cKDTree

    from hairgs_tpu.evaluation.eval_data import (
        load_eval_data_from_gaussians,
    )
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.io.npz import HairEvalData, load_hair_eval_data_npz

    gt = load_hair_eval_data_npz(os.path.join(args.data, "hair_eval_data.npz"))
    pred = load_eval_data_from_gaussians(args.ply)
    print(f"pred points {pred.points.shape[0]}  gt points {gt.points.shape[0]}")

    tree = cKDTree(gt.points)
    d_nn, i_nn = tree.query(pred.points, k=1)
    target = gt.points[i_nn]
    step_dir = target - pred.points
    norm = np.linalg.norm(step_dir, axis=1, keepdims=True)
    unit = step_dir / np.maximum(norm, 1e-12)

    # signed GT direction (the metric's angle gate is unsigned)
    gt_dir = gt.directions[i_nn]
    sign = np.sign(np.sum(gt_dir * pred.directions, axis=1, keepdims=True))
    gt_dir_signed = gt_dir * np.where(sign == 0, 1.0, sign)

    def score(points, directions, label):
        m, _ = compute_metrics(
            HairEvalData(points=points, directions=directions,
                         points_id_to_strand_id=None, edges=None),
            gt, dist_ths=[args.dist_th], angle_ths=[args.angle_th],
            metrics=("precision", "recall", "f1"), bidirectional=True,
        )
        print(
            f"{label:<28} P {m['precision(b)'][0]:.3f}  "
            f"R {m['recall(b)'][0]:.3f}  F1 {m['f1(b)'][0]:.3f}"
        )
        return m["f1(b)"][0]

    print(f"\n@ {args.dist_th * 1000:.0f}mm, {args.angle_th:.0f}deg "
          f"(bidirectional)")
    score(pred.points, pred.directions, "baseline")
    for cap_mm in args.caps_mm:
        cap = cap_mm * 1e-3
        step = unit * np.minimum(norm, cap)
        moved = pred.points + step
        score(moved, pred.directions, f"oracle move cap {cap_mm:g}mm")
    # direction oracle on top of a modest position cap: is the angle gate
    # ever the binding constraint once positions are in?
    cap = 2e-3
    moved = pred.points + unit * np.minimum(norm, cap)
    score(moved, gt_dir_signed, "cap 2mm + oracle dirs")
    # fractional (LR-like) moves: a leg that closes x% of the gap per point
    for lam in (0.25, 0.5, 0.75):
        score(pred.points + lam * step_dir, pred.directions,
              f"fractional move {lam:.0%}")


if __name__ == "__main__":
    main()
