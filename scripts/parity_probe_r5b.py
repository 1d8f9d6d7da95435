#!/usr/bin/env python
"""Round-5 parity forensics: is the residual pallas-vs-XLA error on real TPU
the T_EPS latch flipping under f32 association-order drift, or a systematic
kernel precision bug?

The two compositors (pallas_composite.py / composite.py) run the SAME
latched front-to-back algorithm; their per-pair inclusive transmittance
t_incl differs only by f32 evaluation order (MXU triangular-matmul prefix
vs cumsum; exp(cum)/(1-a) vs exp(cum-l)). The latch `live = t_incl >= 1e-4`
is discontinuous: a pair whose t_incl sits within ulps of 1e-4 can flip
between orders, contributing up to alpha/(1-alpha)*T_EPS ~ 1e-2 to that
pixel — the scale of the observed 2.8e-3 max err. The flip signature is
sharp and testable:

  (a) every pixel with |d| > 1e-4 is SATURATED: final_T < 2*T_EPS on both
      sides (the latch only ever engages at the saturation frontier);
  (b) unsaturated pixels agree to accumulated-f32-drift levels (~1e-5);
  (c) the error is confined to a handful of pixels (p99.99 tiny).

If (a)-(c) hold the gate needs an error model, not a kernel fix; if
unsaturated pixels disagree, there IS a precision bug to hunt.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def stats(name, img_p, img_x, t_p, t_x):
    import jax.numpy as jnp

    d = jnp.max(jnp.abs(img_p - img_x), axis=-1)  # (H, W) over channels
    sat = jnp.maximum(t_p, t_x) < 2e-4  # latch frontier pixels
    d_unsat = jnp.where(sat, 0.0, d)
    flat = jnp.sort(d.reshape(-1))
    n = flat.shape[0]
    print(
        f"[{name}] max={float(jnp.max(d)):.2e} "
        f"p99.99={float(flat[int(n * 0.9999)]):.2e} "
        f"p99={float(flat[int(n * 0.99)]):.2e} "
        f"n>1e-4={int(jnp.sum(d > 1e-4))} n>1e-3={int(jnp.sum(d > 1e-3))} "
        f"sat_px={int(jnp.sum(sat))} "
        f"max_unsat={float(jnp.max(d_unsat)):.2e} "
        f"n_unsat>1e-4={int(jnp.sum(d_unsat > 1e-4))} "
        f"Tdiff_max={float(jnp.max(jnp.abs(t_p - t_x))):.2e}",
        flush=True,
    )


def grad_stats(name, gp, gx):
    import jax.numpy as jnp

    for (k, a), (_, b) in zip(gp._asdict().items(), gx._asdict().items()):
        if b.size == 0:
            continue
        denom = float(jnp.max(jnp.abs(b))) + 1e-6
        d = jnp.abs(a - b)
        rel = d / denom
        fro = float(jnp.linalg.norm((a - b).reshape(-1))) / (
            float(jnp.linalg.norm(b.reshape(-1))) + 1e-6
        )
        print(
            f"[{name}] {k}: maxrel={float(jnp.max(rel)):.1e} fro_rel={fro:.1e}"
            f" n_rel>5e-3={int(jnp.sum(rel > 5e-3))}/{b.size}",
            flush=True,
        )


def main():
    from bench import _wait_for_backend

    if not _wait_for_backend(max_wait=900):
        print("backend unavailable")
        sys.exit(2)

    import jax
    import jax.numpy as jnp

    from bench import build_bench
    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render

    model, opt, cams, width, height = build_bench(n_gaussians=20_000,
                                                  width=512, height=512)
    cam = cams[0]
    kw = dict(active=model.active, width=width, height=height)

    def run(cfg):
        def loss(params):
            inputs = gaussian_render_inputs(params, cam.cam_center, 0)
            out = render(cam, **inputs, **kw, config=cfg)
            img = out["render"]
            return (jnp.sum(img * img) + 0.5 * jnp.sum(out["final_T"]),
                    (img, out["final_T"]))

        (l, (img, t)), g = jax.value_and_grad(loss, has_aux=True)(model.params)
        return float(l), img, t, g

    base = dict(max_tiles_per_gaussian=16, max_pairs_per_tile=1024, chunk=128)
    for tag, extra in [
        ("plain", {}),
        ("aa+alpha_min", dict(antialiasing=True, alpha_min=1e-5)),
    ]:
        lp, img_p, t_p, g_p = run(RasterConfig(use_pallas=True, **base, **extra))
        lx, img_x, t_x, g_x = run(RasterConfig(use_pallas=False, **base, **extra))
        print(f"[{tag}] loss {lp:.4f} vs {lx:.4f} "
              f"(rel {abs(lp - lx) / abs(lx):.1e})", flush=True)
        stats(tag, img_p, img_x, t_p, t_x)
        grad_stats(tag, g_p, g_x)
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
