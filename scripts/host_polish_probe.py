#!/usr/bin/env python
"""GT-free host-side hygiene ops vs strand F1 (CPU dry-run).

On the grown+merged checkpoint (F1 0.5310): (a) local-density outlier
pruning — drop segments whose start point's k-NN radius over the predicted
cloud is in the top X% (standard point-cloud hygiene; targets isolated
clutter the photometric signals cannot identify); (b) Laplacian smoothing
of strand polylines — grown tips extend straight, smoothing curves them
back toward the strand's trend.
"""

import argparse
import os
import shutil
import sys
import tempfile
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="_runs/syn150_512/data")
    ap.add_argument(
        "--ply",
        default="_runs/s3_growth/point_cloud/iteration_30019/point_cloud.ply",
    )
    ap.add_argument("--knn", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from hairgs_tpu.evaluation.eval_data import HairEvalData, compute_eval_data_from_hair
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.io.npz import load_hair_eval_data_npz
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.scene import Scene

    stub = tempfile.mkdtemp(prefix="host_polish_")
    it_dir = os.path.dirname(args.ply)
    os.makedirs(os.path.join(stub, "point_cloud"))
    shutil.copytree(it_dir,
                    os.path.join(stub, "point_cloud", os.path.basename(it_dir)))
    scene_args = types.SimpleNamespace(
        source_path=args.data, model_path=stub, images="images",
        resolution=-1, sh_degree=0, data_device="auto", eval=False)
    scene = Scene(scene_args, shuffle=False)
    model = scene.gaussians
    assert isinstance(model, HairModel)
    gt = load_hair_eval_data_npz(os.path.join(args.data, "hair_eval_data.npz"))

    base_pred = compute_eval_data_from_hair(model)
    ep0 = np.asarray(model.params.endpoints, np.float64)

    def score_pred(pred, label):
        metrics, _ = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        print(f"  {label:<30} n={pred.points.shape[0]:>6}  F1(b) "
              + " ".join(f"{v:.4f}" for v in metrics["f1(b)"])
              + f"  P@4,90 {metrics['precision(b)'][-1]:.4f}"
              + f"  R {metrics['recall(b)'][-1]:.4f}")

    def score_model(label):
        score_pred(compute_eval_data_from_hair(model), label)

    score_pred(base_pred, "baseline (grown+merged)")

    # (a) density pruning on the eval point set
    pts = base_pred.points
    tree = cKDTree(pts)
    d_k = tree.query(pts, k=args.knn + 1)[0][:, -1]
    for pct in (2, 5, 10, 20):
        th = np.percentile(d_k, 100 - pct)
        keep = d_k < th
        score_pred(HairEvalData(points=pts[keep],
                                directions=base_pred.directions[keep],
                                points_id_to_strand_id=(
                                    base_pred.points_id_to_strand_id[keep]),
                                edges=None),
                   f"density-prune top {pct}%")

    # (b) Laplacian smoothing along strand polylines
    info = model.strands_info
    for lam, passes in ((0.5, 1), (0.5, 3), (0.25, 1), (0.15, 1), (0.2, 1),
                        (0.3, 1), (0.35, 1), (0.25, 2)):
        ep = ep0.copy()
        for _ in range(passes):
            ep_new = ep.copy()
            for pairs in info.list_strands:
                seq = np.concatenate([pairs[:1, 0], pairs[:, 1]])
                if len(seq) < 3:
                    continue
                interior = seq[1:-1]
                ep_new[interior] = (1 - lam) * ep[interior] + lam * 0.5 * (
                    ep[seq[:-2]] + ep[seq[2:]])
            ep = ep_new
        model.params = model.params._replace(
            endpoints=jnp.asarray(ep.astype(np.float32)))
        score_model(f"laplacian lam={lam} x{passes}")
    model.params = model.params._replace(
        endpoints=jnp.asarray(ep0.astype(np.float32)))
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
