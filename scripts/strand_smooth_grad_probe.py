#!/usr/bin/env python
"""Does smoothing the photometric gradient ALONG STRANDS recover a usable
alignment signal? (CPU, uses the gradient saved by grad_direction_probe.py)

Rationale: the raw per-endpoint descent direction is ~uncorrelated with the
toward-GT oracle (cos ~+0.02) and a sign-step sweep shows it DECREASES F1.
But the true signal — "this strand sits 4-8mm off the image evidence" — is
spatially smooth along a strand, while the noise (per-pixel residuals,
occlusion flicker) is per-endpoint. Averaging g along each strand polyline
should cancel the noise and keep the common-mode pull. Variants:
  raw      per-endpoint gradient (control)
  win3/9/31 box-smoothed along the strand endpoint sequence
  strand   per-strand mean (rigid translation)
For each: cosine vs oracle by distance band + unit-step and sign-step F1
sweeps at polish-relevant displacement scales.
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
    ap.add_argument("--grad", default="_runs/perf_r4/grad_aa_amin1e5_16.npz")
    ap.add_argument("--eps_mm", type=float, nargs="+", default=[0.2, 0.5, 1.0, 2.0])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from hairgs_tpu.evaluation.eval_data import compute_eval_data_from_hair
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.io.npz import load_hair_eval_data_npz
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.scene import Scene

    blob = np.load(args.grad)
    g = np.asarray(blob["endpoint_grad"], np.float64)
    ply = str(blob["ply"])

    stub = tempfile.mkdtemp(prefix="smooth_grad_")
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
    ep0 = np.asarray(model.params.endpoints, np.float64)

    # strand endpoint sequences (root->tip): pairs (S,2) per strand share
    # consecutive endpoints
    seqs = []
    for pairs in model.strands_info.list_strands:
        seq = np.concatenate([pairs[:1, 0], pairs[:, 1]])
        seqs.append(seq.astype(np.int64))
    n_in_strands = sum(len(s) for s in seqs)
    print(f"{len(seqs)} strands covering {n_in_strands} endpoint slots "
          f"({g.shape[0]} rows)")

    def smooth_along(gvec, window):
        out = np.zeros_like(gvec)
        count = np.zeros(gvec.shape[0])
        for seq in seqs:
            sub = gvec[seq]
            if window >= len(seq):
                sm = np.tile(sub.mean(axis=0), (len(seq), 1))
            else:
                k = np.ones(window) / window
                sm = np.stack(
                    [np.convolve(sub[:, c], k, mode="same") for c in range(3)],
                    axis=1)
                # renormalize the shrinking edges of 'same' convolution
                norm = np.convolve(np.ones(len(seq)), k, mode="same")
                sm = sm / norm[:, None]
            out[seq] += sm
            count[seq] += 1
        out[count > 0] /= count[count > 0, None]
        return out

    def strand_mean(gvec):
        out = np.zeros_like(gvec)
        for seq in seqs:
            out[seq] = gvec[seq].mean(axis=0)
        return out

    tree = cKDTree(gt.points)
    d_nn, i_nn = tree.query(ep0)
    oracle = gt.points[i_nn] - ep0
    dmm = d_nn * 1e3

    def cos_report(direction, label):
        dn = np.linalg.norm(direction, axis=1)
        on = np.linalg.norm(oracle, axis=1)
        ok = (dn > 0) & (on > 1e-9)
        cos = np.sum(-direction[ok] * oracle[ok], axis=1) / (dn[ok] * on[ok])
        band = (dmm[ok] >= 4) & (dmm[ok] < 8)
        print(f"  {label:<12} cos(all) {cos.mean():+.3f}  "
              f"cos(4-8mm) {cos[band].mean():+.3f}  "
              f"frac>0 {np.mean(cos > 0):.3f}")
        return ok

    def score(endpoints, label):
        model.params = model.params._replace(
            endpoints=jnp.asarray(endpoints.astype(np.float32)))
        pred = compute_eval_data_from_hair(model)
        metrics, _ = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        print(f"    {label:<28} F1(b) "
              + " ".join(f"{v:.4f}" for v in metrics["f1(b)"])
              + f"  P@4,90 {metrics['precision(b)'][-1]:.4f}")

    # post-merge strands are ~2.4 endpoints on average, so along-strand
    # smoothing collapses to the strand mean; the spatially-coherent
    # misalignment field (if any) lives ACROSS neighboring strands — kNN
    # smoothing over the 3D endpoint cloud tests that directly
    ep_tree = cKDTree(ep0)

    def knn_mean(gvec, k):
        _, idx = ep_tree.query(ep0, k=k)
        return gvec[idx].mean(axis=1)

    variants = {
        "raw": g,
        "win9": smooth_along(g, 9),
        "strand": strand_mean(g),
        "knn16": knn_mean(g, 16),
        "knn64": knn_mean(g, 64),
        "knn256": knn_mean(g, 256),
    }
    score(ep0, "eps=0 baseline")
    for name, gv in variants.items():
        cos_report(gv, name)
        dn = np.linalg.norm(gv, axis=1, keepdims=True)
        unit = np.where(dn > 0, gv / np.maximum(dn, 1e-30), 0.0)
        for eps in args.eps_mm:
            score(ep0 - eps * 1e-3 * unit, f"{name} unit-step {eps}mm")
        score(ep0 - 0.5e-3 * np.sign(gv), f"{name} sign-step 0.5mm")
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
