#!/usr/bin/env python
"""Interleave growth with Stage-II merging and track F1 (CPU dry-run).

Growth alone peaks at 2 events (F1 0.5309): extended tips drift off real
strands as the direction average goes stale. Merging between growth
rounds welds tip-to-root pairs into longer strands, refreshing both the
strand structure and the tips' direction estimate — potentially pushing
the coverage/precision trade further than growth alone.
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
    ap.add_argument("--rounds", type=int, default=3,
                    help="grow-grow-merge rounds")
    ap.add_argument("--growth_length", type=float, default=0.002)
    ap.add_argument("--merge_iters", type=int, default=30)
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
    from hairgs_tpu.topo.merge import stage2_merge_loop

    stub = tempfile.mkdtemp(prefix="merge_grow_")
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
        ns = len(model.strands_info.list_strands)
        print(f"  {label:<26} segs {model.num_segments:>7} strands {ns:>6}"
              f"  F1(b) " + " ".join(f"{v:.4f}" for v in metrics["f1(b)"])
              + f"  P@4,90 {metrics['precision(b)'][-1]:.4f}"
              + f"  R {metrics['recall(b)'][-1]:.4f}"
              + f"  SC {metrics['strand_consistency(b)'][-1]:.4f}")

    score("checkpoint")
    for r in range(1, args.rounds + 1):
        for ev in range(2):
            n = hair_growing(model, growth_length=args.growth_length)
        score(f"round {r}: +2 growth")
        stage2_merge_loop(model, max_iterations=args.merge_iters)
        score(f"round {r}: merged")
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
