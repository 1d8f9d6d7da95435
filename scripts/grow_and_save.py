#!/usr/bin/env python
"""Apply N strand-growth events to a hair checkpoint and save the result
as a new checkpoint directory (Stage II.5: host-side geometric growth).

The growth dry-run (scripts/growth_f1_probe.py, BASELINE.md) measured that
two 2mm tip-extension events on the post-merge state raise F1(b)@(4mm,90)
from 0.5180 to 0.5309 (recall 0.652 -> 0.727) — coverage, not alignment,
was the binding axis. hair_growing is the reference's growing()
(scene/hair_gaussian_model.py:1098-1203; shipped broken upstream —
cat_segments called with 6 of 7 args — and disabled by its default
growth_interval; implemented correctly here), applied as a standalone
pipeline step the same way Stage II applies host-side merging.

Usage:
  python scripts/grow_and_save.py -m _runs/syn150_512/model \
      --out _runs/s3_growth [--events 2]
Then score with:
  python eval.py -s <data> -p <out>/point_cloud/iteration_N/point_cloud.ply \
      -pt gs -m <out>
"""

import argparse
import os
import shutil
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", "-s", default="_runs/syn150_512/data")
    ap.add_argument("--model", "-m", default="_runs/syn150_512/model")
    ap.add_argument("--base_iter", type=int, default=0,
                    help="checkpoint iteration to grow (0 = latest in the "
                         "model dir)")
    ap.add_argument("--out", default="_runs/s3_growth")
    ap.add_argument("--events", type=int, default=2)
    ap.add_argument("--growth_length", type=float, default=0.002)
    ap.add_argument("--merge_iters", type=int, default=30,
                    help="Stage-II merge pass after growth (welds grown "
                         "tips into longer strands: F1 unchanged, strand-"
                         "consistency 0.208 -> 0.237 measured); 0 disables")
    ap.add_argument("--smooth_lam", type=float, default=0.0,
                    help="one Laplacian smoothing pass over strand "
                         "polylines after the merge (0.15-0.3 adds ~+0.001 "
                         "F1 on the 512^2 benchmark; 0 = off)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from hairgs_tpu.config import OptimizationConfig
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.scene import Scene
    from hairgs_tpu.topo.graph_ops import hair_growing

    if args.base_iter == 0:
        iters = [int(d.split("_")[1])
                 for d in os.listdir(os.path.join(args.model, "point_cloud"))
                 if d.startswith("iteration_")]
        args.base_iter = max(iters)
        print(f"growing latest checkpoint: iteration_{args.base_iter}")
    base = os.path.join(args.model, "point_cloud", f"iteration_{args.base_iter}")
    os.makedirs(os.path.join(args.out, "point_cloud"), exist_ok=True)
    stage = os.path.join(args.out, "point_cloud", f"iteration_{args.base_iter}")
    if not os.path.exists(stage):
        shutil.copytree(base, stage)

    scene_args = types.SimpleNamespace(
        source_path=args.data, model_path=args.out, images="images",
        resolution=-1, sh_degree=0, data_device="auto", eval=False)
    scene = Scene(scene_args, shuffle=False)
    model = scene.gaussians
    assert isinstance(model, HairModel), type(model)
    assert scene.loaded_iter == args.base_iter, scene.loaded_iter
    model.training_setup(OptimizationConfig())

    grown = 0
    for ev in range(args.events):
        n = hair_growing(model, growth_length=args.growth_length)
        grown += n
        print(f"growth event {ev + 1}: +{n} tip segments "
              f"({model.num_segments} total)")
        if n == 0:
            break

    if args.merge_iters > 0:
        from hairgs_tpu.topo.merge import stage2_merge_loop

        n_before = len(model.strands_info.list_strands)
        stage2_merge_loop(model, max_iterations=args.merge_iters)
        n_after = len(model.strands_info.list_strands)
        print(f"merge pass: {n_before} -> {n_after} strands")

    if args.smooth_lam > 0:
        import jax.numpy as jnp
        import numpy as np

        lam = args.smooth_lam
        ep = np.asarray(model.params.endpoints, np.float64)
        ep_new = ep.copy()
        for pairs in model.strands_info.list_strands:
            seq = np.concatenate([pairs[:1, 0], pairs[:, 1]])
            if len(seq) < 3:
                continue
            interior = seq[1:-1]
            ep_new[interior] = (1 - lam) * ep[interior] + lam * 0.5 * (
                ep[seq[:-2]] + ep[seq[2:]])
        model.params = model.params._replace(
            endpoints=jnp.asarray(ep_new.astype(np.float32)))
        print(f"laplacian smoothing pass (lam={lam}) applied")

    out_ply = scene.save(args.events)  # scene.save adds loaded_iter offset
    print(f"saved grown checkpoint ({grown} new segments) -> {out_ply}")
    assert os.path.exists(out_ply)
    return out_ply


if __name__ == "__main__":
    main()
