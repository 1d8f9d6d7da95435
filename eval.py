#!/usr/bin/env python
"""Standalone evaluation: GT npz vs a prediction file.

Parity target: reference eval.py:13-59 (which is broken as shipped — it
unpacks a `return_table` result that loss/metrics.py never implemented; the
intended table output is implemented here).
"""

import sys
from argparse import ArgumentParser

import jax

# The standalone eval is the HOST oracle (scipy metrics + CPU-renderable
# image metrics); it must keep working while the TPU backend is down —
# round-4 outage: an eager jnp op during model loading hung for minutes
# retrying the axon tunnel before any metric ran.
jax.config.update("jax_platforms", "cpu")

from hairgs_tpu.evaluation.eval_data import eval_data_loading_callbacks
from hairgs_tpu.evaluation.metrics import compute_metrics


def main():
    parser = ArgumentParser(description="Evaluation parameters")
    parser.add_argument("--source_path", "-s", required=True,
                        help="dataset path containing hair_eval_data.npz")
    parser.add_argument("--prediction_path", "-p", required=True)
    parser.add_argument("--prediction_type", "-pt", default="gs",
                        choices=sorted(eval_data_loading_callbacks.keys()))
    from argparse import BooleanOptionalAction

    parser.add_argument("--bidirectional", action=BooleanOptionalAction, default=True)
    parser.add_argument("--sh_degree", type=int, default=0)
    parser.add_argument("--model_path", "-m", default=None,
                        help="with a model dir, additionally report "
                             "PSNR/SSIM image metrics over the training views")
    args = parser.parse_args(sys.argv[1:])

    import os

    gt = eval_data_loading_callbacks["gt"](
        os.path.join(args.source_path, "hair_eval_data.npz")
    )
    loader = eval_data_loading_callbacks[args.prediction_type]
    if args.prediction_type == "gs":
        pred = loader(args.prediction_path, sh_degree=args.sh_degree)
    else:
        pred = loader(args.prediction_path)

    metrics, thresholds, table = compute_metrics(
        pred=pred, gt=gt, bidirectional=args.bidirectional, return_table=True
    )
    print(table)

    if args.model_path:
        import types

        from hairgs_tpu.evaluation.image_metrics import evaluate_image_metrics
        from hairgs_tpu.scene import Scene

        scene_args = types.SimpleNamespace(
            source_path=args.source_path, model_path=args.model_path,
            images="images", resolution=-1, sh_degree=args.sh_degree,
            data_device="auto", eval=False)
        scene = Scene(scene_args, shuffle=False)
        im = evaluate_image_metrics(scene.gaussians, scene.get_cameras())
        print("image metrics (train views): "
              + "  ".join(f"{k} {v:.3f}" for k, v in im.items()))
    return metrics


if __name__ == "__main__":
    main()
