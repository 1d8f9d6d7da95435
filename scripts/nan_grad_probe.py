#!/usr/bin/env python
"""Localize the round-4 on-TPU parity FAIL: which render path (pallas vs
XLA-scan) emits NaN into which gradient leaves, and does raising the MXU
matmul precision close the non-NaN error gap?

The first-ever real-hardware run of scripts/tpu_parity_check.py (Aug 19)
reported `grad rel errs xyz=nan scaling=nan rotation=nan` plus a 2.7e-3
image error (threshold 1e-3). Interpret mode on CPU is clean, so the cause
is TPU-specific: candidate 1 is the MXU's default single-bf16-pass matmul
precision (jax.lax.dot_general with precision=None) inside BOTH the pallas
kernel's triangular-matmul prefix sums and the XLA preprocess einsums;
candidate 2 is a genuine guard gap that only trips on TPU numerics.

Reports, per path (pallas / XLA) and per leaf: NaN count, Inf count,
max |g|. Then re-measures the pallas-vs-XLA image/grad gap under
jax_default_matmul_precision in {default, float32} to isolate the
precision contribution.

Usage: python scripts/nan_grad_probe.py [--cpu] [--n 20000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--paths", default=None,
                    help="comma list: pallas,xla (default both; with --cpu "
                         "defaults to xla only — pallas is interpret-mode "
                         "on CPU and impractically slow at full scale)")
    ap.add_argument("--skip_precision", action="store_true")
    args = ap.parse_args()
    if args.paths is None:
        args.paths = "xla" if args.cpu else "pallas,xla"

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import build_bench
    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render

    model, opt, cams, width, height = build_bench(
        n_gaussians=args.n, width=args.width, height=args.width)
    cam = cams[0]
    kw = dict(active=model.active, width=width, height=height)

    def loss(params, cfg):
        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        out = render(cam, **inputs, **kw, config=cfg)
        img = out["render"]
        return jnp.sum(img * img) + 0.5 * jnp.sum(out["final_T"]), img

    def gradstats(use_pallas):
        cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                           chunk=128, use_pallas=use_pallas)
        (l, img), g = jax.value_and_grad(
            lambda p: loss(p, cfg), has_aux=True)(model.params)
        print(f"--- path={'pallas' if use_pallas else 'xla'} loss={float(l):.4f} "
              f"img_nan={int(jnp.sum(jnp.isnan(img)))}")
        for k, a in g._asdict().items():
            if a.size == 0:
                continue
            nn = int(jnp.sum(jnp.isnan(a)))
            ni = int(jnp.sum(jnp.isinf(a)))
            # split by active row: capacity_round pads the arena, and
            # nonfinites confined to pad rows are a different (benign-er)
            # finding than nonfinites on live gaussians
            bad = jnp.isnan(a) | jnp.isinf(a)
            if a.shape[0] == model.active.shape[0]:
                act_mask = model.active.reshape(
                    (-1,) + (1,) * (a.ndim - 1))
                na = int(jnp.sum(bad & act_mask))
            else:
                na = nn + ni
            mx = float(jnp.max(jnp.where(jnp.isfinite(a), jnp.abs(a), 0.0)))
            flag = "  <-- NONFINITE" if nn or ni else ""
            print(f"    {k:14s} nan={nn:6d} inf={ni:6d} active={na:6d} "
                  f"max|g|={mx:.3e}{flag}")
        return img, g

    paths = args.paths.split(",")
    print(f"backend={jax.default_backend()} n={args.n} {width}x{height}")
    img_p = gp = img_x = gx = None
    if "pallas" in paths:
        img_p, gp = gradstats(True)
    if "xla" in paths:
        img_x, gx = gradstats(False)
    if img_p is not None and img_x is not None:
        err = float(jnp.max(jnp.abs(img_p - img_x)))
        print(f"pallas-vs-xla image max err (default precision): {err:.2e}")
    if args.skip_precision:
        return

    # precision isolation: re-trace everything with full-f32 matmuls
    jax.config.update("jax_default_matmul_precision", "float32")
    print("--- retrace with jax_default_matmul_precision=float32")
    img_p2 = gp2 = img_x2 = gx2 = None
    if "pallas" in paths:
        img_p2, gp2 = gradstats(True)
    if "xla" in paths:
        img_x2, gx2 = gradstats(False)
    if img_p2 is None or img_x2 is None:
        return
    err2 = float(jnp.max(jnp.abs(img_p2 - img_x2)))
    print(f"pallas-vs-xla image max err (float32 precision): {err2:.2e}")
    for k, a in gp2._asdict().items():
        b = getattr(gx2, k)
        if b.size == 0:
            continue
        denom = float(jnp.max(jnp.abs(b))) + 1e-6
        rel = float(jnp.max(jnp.abs(a - b))) / denom
        print(f"    relerr[{k}] = {rel:.2e}")


if __name__ == "__main__":
    main()
