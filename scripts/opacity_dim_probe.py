#!/usr/bin/env python
"""Simulate the polish legs' OPACITY/MASK channel effect on strand F1 (CPU).

The round-4 probes show position descent cannot improve F1 — but the eval
set itself is opacity/mask-gated (sigmoid(opacity) >= 0.005 AND
sigmoid(mask) >= 0.25, reference scene/gaussian_model.py:37-38), and the
visibility probe shows the photometrically DOMINANT segments sit off-GT
(median 8.7mm): the photometric loss should dim background-covering
segments, pushing them OUT of the eval set (precision up), and brighten
near-GT dim ones (recall kept). Opacity LR is 0.05 on a logit, so a
1-2k-iter leg can move logits by many units wherever the gradient sign is
stable — simulate exactly that: logit' = logit - L*sign(g) for a sweep of
total logit motions L, re-derive the eval membership, re-score F1.

Needs grad_direction_probe.py --save_grad output with channel gradients.
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
    ap.add_argument("--grad", default="_runs/perf_r4/grad_chan_aa1e5_16.npz")
    ap.add_argument("--logit_motion", type=float, nargs="+",
                    default=[1.0, 2.0, 5.0, 10.0])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from hairgs_tpu.evaluation.eval_data import HairEvalData
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.io.npz import load_hair_eval_data_npz
    from hairgs_tpu.models.gaussian import FG_BIN_TH, OPACITY_TH
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.scene import Scene

    blob = np.load(args.grad)
    g_opa = np.asarray(blob["opacity_grad"])[:, 0]
    g_mask = np.asarray(blob["mask_grad"])[:, 0]
    ply = str(blob["ply"])

    stub = tempfile.mkdtemp(prefix="dim_probe_")
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
    pairs = np.asarray(model.graph.endpoint_pairs)
    active = np.asarray(model.graph.seg_active)
    opa_logit = np.asarray(model.params.opacity)[:, 0].astype(np.float64)
    mask_logit = np.asarray(model.params.mask)[:, 0].astype(np.float64)
    info = model.strands_info

    start = ep[pairs[:, 0]]
    d = ep[pairs[:, 1]] - start
    dn = np.linalg.norm(d, axis=1, keepdims=True)
    dirs = d / np.maximum(dn, 1e-12)
    p2s = info.id_to_strand_id[pairs[:, 0]]

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    def score(keep, label):
        keep = keep & active
        pred = HairEvalData(points=start[keep], directions=dirs[keep],
                            points_id_to_strand_id=p2s[keep], edges=None)
        metrics, _ = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        print(f"  {label:<28} n={int(keep.sum()):>6}  F1(b) "
              + " ".join(f"{v:.4f}" for v in metrics["f1(b)"])
              + f"  P@4,90 {metrics['precision(b)'][-1]:.4f}"
              + f"  R {metrics['recall(b)'][-1]:.4f}")

    keep0 = (sig(opa_logit) >= OPACITY_TH) & (sig(mask_logit) >= FG_BIN_TH)
    print(f"dimming-direction stats over baseline-eval segments: "
          f"g_opa>0 {np.mean(g_opa[keep0 & active] > 0):.3f}  "
          f"g_mask>0 {np.mean(g_mask[keep0 & active] > 0):.3f}")
    score(keep0, "baseline (logits as-is)")
    for L in args.logit_motion:
        opa2 = opa_logit - L * np.sign(g_opa)
        mask2 = mask_logit - L * np.sign(g_mask)
        keep = (sig(opa2) >= OPACITY_TH) & (sig(mask2) >= FG_BIN_TH)
        score(keep, f"sign-dim L={L} (opa+mask)")
        keep_o = (sig(opa2) >= OPACITY_TH) & (sig(mask_logit) >= FG_BIN_TH)
        score(keep_o, f"sign-dim L={L} (opa only)")
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
