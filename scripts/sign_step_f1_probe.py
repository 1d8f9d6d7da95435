#!/usr/bin/env python
"""Dry-run the polish_lr leg's FIRST PHASE on CPU: apply the exact early-Adam
displacement (-eps * sign(g) per coordinate; fresh moments make Adam's first
steps lr*sign(g)) to the real checkpoint endpoints and re-score strand F1.

The oracle-alignment probe (BASELINE.md) shows +0.05 F1 per 0.5mm of
COHERENT motion; the gradient probes show the descent direction is only
weakly aligned (cos ~+0.02). This probe resolves the question those two
leave open — does the actual descent direction IMPROVE or DAMAGE F1 at the
displacement scale one gradient re-evaluation governs (~0.05-0.5mm)?

Usage:
  python scripts/sign_step_f1_probe.py \
      --grad _runs/perf_r4/grad_aa_amin1e5_16.npz [--eps_mm 0.05 0.1 ...]

Run AFTER grad_direction_probe.py --save_grad (which sums the endpoint
gradient over the training views at the leg's raster config).
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
    ap.add_argument("--eps_mm", type=float, nargs="+",
                    default=[0.0, 0.05, 0.1, 0.2, 0.5, 1.0])
    ap.add_argument("--oracle_cap_mm", type=float, default=0.5,
                    help="also score an oracle move at this cap for context")
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
    g = blob["endpoint_grad"]
    ply = str(blob["ply"])
    print(f"gradient from {args.grad}: {int(blob['n_cams'])} cams, "
          f"aa={bool(blob['aa'])}, alpha_min={float(blob['alpha_min']):g}, "
          f"nonzero rows {int((np.abs(g).sum(1) > 0).sum())}/{g.shape[0]}")

    stub = tempfile.mkdtemp(prefix="sign_step_")
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
    assert g.shape == ep0.shape, (g.shape, ep0.shape)
    sgn = np.sign(g)

    def score(endpoints, label):
        model.params = model.params._replace(
            endpoints=jnp.asarray(endpoints.astype(np.float32)))
        pred = compute_eval_data_from_hair(model)
        metrics, ths = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        f1 = metrics["f1(b)"]
        prec = metrics["precision(b)"]
        rec = metrics["recall(b)"]
        print(f"  {label:<26} F1(b) "
              + " ".join(f"{v:.4f}" for v in f1)
              + f"   P@4mm,90 {prec[-1]:.4f}  R {rec[-1]:.4f}")
        return f1[-1]

    print(f"thresholds: (2mm,20) (3mm,30) (4mm,40) (4mm,90)")
    base = score(ep0, "eps=0 (checkpoint)")
    for eps in args.eps_mm:
        if eps == 0.0:
            continue
        score(ep0 - eps * 1e-3 * sgn, f"sign-step eps={eps}mm")

    # context: the oracle direction at the same scale
    tree = cKDTree(gt.points)
    d, i = tree.query(ep0)
    to_gt = gt.points[i] - ep0
    norm = np.linalg.norm(to_gt, axis=1, keepdims=True)
    cap = args.oracle_cap_mm * 1e-3
    step = to_gt * np.minimum(1.0, cap / np.maximum(norm, 1e-12))
    score(ep0 + step, f"oracle cap={args.oracle_cap_mm}mm")
    print(f"baseline F1(b)@(4mm,90) = {base:.4f}")
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
