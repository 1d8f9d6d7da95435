#!/usr/bin/env python
"""Dry-run strand GROWTH against the F1 metric (CPU, no rendering).

The linearized probes show no gradient channel can raise F1 from the
post-merge state, and the oracle bounds recall at 0.834 — coverage, not
alignment, is the open axis. hair_growing() (reference growing(),
scene/hair_gaussian_model.py:1098-1203 — shipped broken and disabled
upstream, implemented correctly here) extends every sub-length strand's
tip 2mm along its averaged direction. It is a pure host-side topology op,
so the full growth sequence can be applied to the real checkpoint and
re-scored per event without any chip time. Training between events would
additionally adjust/dim the new segments (measured F1-neutral), so this
zeroth-order sweep brackets what a growth-enabled leg can add.
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
        default="_runs/syn150_512/model/point_cloud/iteration_30017/point_cloud.ply",
    )
    ap.add_argument("--events", type=int, default=20)
    ap.add_argument("--growth_length", type=float, default=0.002)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from hairgs_tpu.config import OptimizationConfig
    from hairgs_tpu.evaluation.eval_data import compute_eval_data_from_hair
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.io.npz import load_hair_eval_data_npz
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.scene import Scene
    from hairgs_tpu.topo.graph_ops import hair_growing

    stub = tempfile.mkdtemp(prefix="growth_probe_")
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
    model.training_setup(OptimizationConfig())
    gt = load_hair_eval_data_npz(os.path.join(args.data, "hair_eval_data.npz"))

    def score(label):
        pred = compute_eval_data_from_hair(model)
        metrics, _ = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        print(f"  {label:<22} segs {model.num_segments:>7}  F1(b) "
              + " ".join(f"{v:.4f}" for v in metrics["f1(b)"])
              + f"  P@4,90 {metrics['precision(b)'][-1]:.4f}"
              + f"  R {metrics['recall(b)'][-1]:.4f}")
        return metrics["f1(b)"][-1]

    print("thresholds: (2mm,20) (3mm,30) (4mm,40) (4mm,90)")
    best = score("event 0 (checkpoint)")
    best_ev = 0
    for ev in range(1, args.events + 1):
        n = hair_growing(model, growth_length=args.growth_length)
        f1 = score(f"event {ev} (+{n} tips)")
        if f1 > best:
            best, best_ev = f1, ev
        if n == 0:
            print("  no growable strands left")
            break
    print(f"best F1(b)@(4mm,90) {best:.4f} at event {best_ev}")
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
