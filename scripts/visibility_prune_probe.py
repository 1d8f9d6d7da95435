#!/usr/bin/env python
"""Does pruning never-visible segments raise strand F1? (CPU)

The AA probes found 61% of post-merge endpoints receive zero gradient in
EVERY training view under the reference 1/255 alpha gate with
--antialiasing: their compensated alpha never crosses the gate, i.e. the
renderer considers them invisible, yet the F1 metric still scores them as
predicted points. If invisibility correlates with distance from GT, a
visibility prune (clean_gaussians-style model hygiene, reference
scene/hair_gaussian_model.py:1502-1515 prunes by opacity the same way)
directly raises precision without touching recall.

Needs: grad_direction_probe.py --n_cams 16 --aa --save_grad <npz> (the
zero rows of the 16-view gradient sum ARE the never-visible mask).
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
    ap.add_argument("--grad", default="_runs/perf_r4/grad_aa_default_16.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from scipy.spatial import cKDTree

    from hairgs_tpu.evaluation.eval_data import HairEvalData
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.io.npz import load_hair_eval_data_npz
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.scene import Scene

    blob = np.load(args.grad)
    g = np.asarray(blob["endpoint_grad"])
    ply = str(blob["ply"])
    visible_ep = np.abs(g).sum(axis=1) > 0

    stub = tempfile.mkdtemp(prefix="vis_prune_")
    it_dir = os.path.dirname(ply)
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
    ep = np.asarray(model.params.endpoints, np.float64)

    # diagnosis: are invisible endpoints farther from GT?
    tree = cKDTree(gt.points)
    d_nn, _ = tree.query(ep)
    dmm = d_nn * 1e3
    used = np.unique(
        np.asarray(model.graph.endpoint_pairs)[np.asarray(model.graph.seg_active)])
    vis_mask = np.zeros(ep.shape[0], bool)
    vis_mask[:] = False
    vis_mask[used] = visible_ep[used]
    inv_used = used[~visible_ep[used]]
    vis_used = used[visible_ep[used]]
    print(f"visible endpoints {vis_used.size}, never-visible {inv_used.size}")
    for nm, idx in (("visible", vis_used), ("never-visible", inv_used)):
        d = dmm[idx]
        print(f"  {nm:<14} median {np.median(d):.2f}mm  "
              f"frac<=4mm {np.mean(d <= 4):.3f}  frac 4-8mm "
              f"{np.mean((d > 4) & (d <= 8)):.3f}  frac>8mm {np.mean(d > 8):.3f}")

    # pred eval data with a per-segment keep mask (mirrors
    # compute_eval_data_from_hair, which walks strands_info)
    info = model.strands_info
    segments_id = np.concatenate(info.list_strands, axis=0)  # (P, 2) ep ids
    points = ep[segments_id[:, 0]]
    dirs = ep[segments_id[:, 1]] - ep[segments_id[:, 0]]
    dirs = dirs / np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    p2s = info.id_to_strand_id[segments_id[:, 0]]

    def score(keep, label):
        pred = HairEvalData(points=points[keep], directions=dirs[keep],
                            points_id_to_strand_id=p2s[keep], edges=None)
        metrics, _ = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        print(f"  {label:<34} n={int(keep.sum()):>6}  F1(b) "
              + " ".join(f"{v:.4f}" for v in metrics["f1(b)"])
              + f"  P@4,90 {metrics['precision(b)'][-1]:.4f}"
              + f"  R {metrics['recall(b)'][-1]:.4f}")

    all_keep = np.ones(points.shape[0], bool)
    score(all_keep, "baseline (no prune)")
    both_vis = vis_mask[segments_id[:, 0]] & vis_mask[segments_id[:, 1]]
    any_vis = vis_mask[segments_id[:, 0]] | vis_mask[segments_id[:, 1]]
    score(any_vis, "prune segs w/ BOTH eps invisible")
    score(both_vis, "prune segs w/ ANY ep invisible")
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
