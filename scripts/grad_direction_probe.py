#!/usr/bin/env python
"""Does the photometric gradient point toward GT? (CPU, pre-chip-window)

The polish_lr corrective leg bets that gradient descent on the photometric
loss moves the post-merge geometry the way the oracle-alignment probe
does (toward nearest GT). This probe checks the bet directly: one
backward pass at the real checkpoint/resolution, then per-endpoint cosine
between the descent direction (-d endpoints) and the oracle direction
(nearest GT point - endpoint). Run with and without --antialiasing to
also rank the AA lever at the gradient level before burning chip time.

Usage:
  python scripts/grad_direction_probe.py [--aa] [--n_cams 2] \
      [--ply .../iteration_30017/point_cloud.ply]

~5-15 min per config on 1 CPU (512^2, 64k segments, XLA path).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="_runs/syn150_512/data")
    ap.add_argument(
        "--ply",
        default="_runs/syn150_512/model/point_cloud/iteration_30017/point_cloud.ply",
    )
    ap.add_argument("--aa", action="store_true")
    ap.add_argument("--alpha_min", type=float, default=1.0 / 255.0,
                    help="per-pair alpha gate; lower to measure how many "
                         "AA-frozen endpoints a gate value un-freezes")
    ap.add_argument("--n_cams", type=int, default=2)
    ap.add_argument("--max_tiles", type=int, default=64)
    ap.add_argument("--max_pairs", type=int, default=2048,
                    help="per-tile pair budget; coarse resolutions pack the "
                         "same pairs into 16x fewer tiles — raise it there")
    ap.add_argument("--save_grad", default=None,
                    help="npz path for the summed endpoint gradient (feeds "
                         "scripts/sign_step_f1_probe.py)")
    ap.add_argument("--resolution", type=int, default=-1,
                    help="reference-style downscale (1/2/4/8): coarse "
                         "renders widen the photometric basin — the "
                         "coarse-to-fine alignment hypothesis")
    # loss-mix overrides: rank which loss term's endpoint gradient actually
    # points toward GT (λ_orientation=100 dominates the default mix, but the
    # oracle probe showed the angle gate never binds — its gradient may be
    # precision-neutral noise)
    ap.add_argument("--lambda_orientation", type=float, default=None)
    ap.add_argument("--lambda_dssim", type=float, default=None)
    ap.add_argument("--lambda_mask", type=float, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import types

    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from hairgs_tpu.config import OptimizationConfig
    from hairgs_tpu.io.npz import load_hair_eval_data_npz
    from hairgs_tpu.models.hair import HairModel, hair_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig
    from hairgs_tpu.scene import Scene
    from hairgs_tpu.train.trainer import render_loss_and_grads

    # cameras at native resolution (Scene would load the LATEST checkpoint,
    # so point model_path at a stub dir holding only the probe checkpoint)
    import shutil
    import tempfile

    stub = tempfile.mkdtemp(prefix="grad_probe_")
    it_dir = os.path.dirname(args.ply)
    os.makedirs(os.path.join(stub, "point_cloud"))
    shutil.copytree(
        it_dir, os.path.join(stub, "point_cloud", os.path.basename(it_dir))
    )
    scene_args = types.SimpleNamespace(
        source_path=args.data, model_path=stub, images="images",
        resolution=args.resolution, sh_degree=0, data_device="auto",
        eval=False)
    scene = Scene(scene_args, shuffle=False)
    model = scene.gaussians
    assert isinstance(model, HairModel), type(model)
    cams = scene.get_cameras()[: args.n_cams]
    width, height = cams[0].image.shape[1], cams[0].image.shape[0]
    print(f"{model.num_segments} segments, {len(cams)} cams at "
          f"{width}x{height}, aa={args.aa}, alpha_min={args.alpha_min:g}")

    import dataclasses

    opt = OptimizationConfig()
    overrides = {
        k: getattr(args, k)
        for k in ("lambda_orientation", "lambda_dssim", "lambda_mask")
        if getattr(args, k) is not None
    }
    if overrides:
        opt = dataclasses.replace(opt, **overrides)
        print(f"loss overrides: {overrides}")
    cfg = RasterConfig(
        max_tiles_per_gaussian=args.max_tiles,
        max_pairs_per_tile=args.max_pairs,
        chunk=128, antialiasing=args.aa, alpha_min=args.alpha_min,
    )
    graph = model.graph
    dtsf = model.dist_to_scale_factor

    g_total = None
    for cam in cams:
        t0 = time.time()
        loss, grads, _, aux = render_loss_and_grads(
            lambda p: hair_render_inputs(p, graph, cam.cam_center, 0, dtsf),
            model.params, cam, graph.seg_active, opt, cfg, width, height,
        )
        gtree = dict(
            endpoints=np.asarray(grads.endpoints, np.float64),
            opacity=np.asarray(grads.opacity, np.float64),
            mask=np.asarray(grads.mask, np.float64),
            width=np.asarray(grads.width, np.float64),
        )
        if g_total is None:
            g_total = gtree
        else:
            g_total = {k: g_total[k] + v for k, v in gtree.items()}
        print(f"  view: loss {float(loss):.4f} "
              f"overflow p/t {int(aux['overflow_pairs'])}/"
              f"{int(aux['overflow_tiles'])}  {time.time() - t0:.0f}s")

    if args.save_grad:
        np.savez(args.save_grad, endpoint_grad=g_total["endpoints"],
                 opacity_grad=g_total["opacity"], mask_grad=g_total["mask"],
                 width_grad=g_total["width"],
                 ply=args.ply, n_cams=args.n_cams, aa=args.aa,
                 alpha_min=args.alpha_min)
        print(f"saved summed gradients -> {args.save_grad}")

    # oracle direction per endpoint that carries gradient
    gt = load_hair_eval_data_npz(os.path.join(args.data, "hair_eval_data.npz"))
    ep = np.asarray(model.params.endpoints, np.float64)
    used = np.unique(np.asarray(graph.endpoint_pairs)[np.asarray(graph.seg_active)])
    tree = cKDTree(gt.points)
    d_nn, i_nn = tree.query(ep[used])
    oracle = gt.points[i_nn] - ep[used]
    step = -g_total["endpoints"][used]

    gn = np.linalg.norm(step, axis=1)
    on = np.linalg.norm(oracle, axis=1)
    ok = (gn > 0) & (on > 1e-9)
    cos = np.sum(step[ok] * oracle[ok], axis=1) / (gn[ok] * on[ok])
    # Adam with fresh (zero) moments steps lr*sign(g) per coordinate, and the
    # polish legs restart the optimizer state — so the SIGN direction, not the
    # raw gradient, is what the first hundreds of iterations actually follow.
    sgn = np.sign(step[ok])
    sn = np.linalg.norm(sgn, axis=1)
    cos_sgn = np.where(
        sn > 0, np.sum(sgn * oracle[ok], axis=1) / (sn * on[ok] + 1e-30), 0.0)

    def band(mask, label):
        if mask.sum() == 0:
            return
        c = cos[mask]
        cs = cos_sgn[mask]
        ww = gn[ok][mask]
        print(f"  {label:<22} n {mask.sum():>6}  mean cos {c.mean():+.3f}  "
              f"|g|-weighted {np.sum(c * ww) / ww.sum():+.3f}  "
              f"frac>0 {np.mean(c > 0):.3f}  sign-cos {cs.mean():+.3f}  "
              f"sign-frac>0 {np.mean(cs > 0):.3f}")

    print(f"\nendpoints with gradient: {ok.sum()}/{used.size}")
    band(np.ones(ok.sum(), bool), "all")
    dmm = d_nn[ok] * 1e3
    band(dmm < 2, "nearest GT < 2mm")
    band((dmm >= 2) & (dmm < 4), "2-4mm")
    band((dmm >= 4) & (dmm < 8), "4-8mm (the F1 band)")
    band(dmm >= 8, ">= 8mm")
    shutil.rmtree(stub)


if __name__ == "__main__":
    main()
