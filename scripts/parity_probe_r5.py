#!/usr/bin/env python
"""Round-5 parity triage probe: identify WHICH side (pallas vs XLA) produces
the NaN xyz/scaling/rotation grads in the round-4 on-TPU parity FAIL
(_runs/perf_r4/parity.txt), and print the actual grad max-abs diffs for the
variants the gate only reported as boolean bit-identity violations.

Safe to run while a training leg owns the chip: correctness only, no timing.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def nan_report(name, grads, active):
    import jax.numpy as jnp
    lines = []
    for k, a in grads._asdict().items():
        if a.size == 0:
            continue
        bad = jnp.isnan(a) | jnp.isinf(a)
        total = int(jnp.sum(bad))
        if a.ndim > 1:
            act = int(jnp.sum(bad & active[:, None] if a.shape[0] == active.shape[0]
                              else bad))
        else:
            act = int(jnp.sum(bad & active)) if a.shape[0] == active.shape[0] else total
        if total:
            rows = jnp.nonzero(jnp.any(bad.reshape(bad.shape[0], -1), axis=-1),
                               size=8, fill_value=-1)[0]
            lines.append(f"  {k}: {total} nonfinite ({act} on active rows); "
                         f"first rows {list(np.asarray(rows))}")
    print(f"[{name}] " + ("FINITE everywhere" if not lines else "nonfinite:"))
    for ln in lines:
        print(ln)


def main():
    from bench import _wait_for_backend, build_bench

    if not _wait_for_backend(max_wait=900):
        print("no backend")
        sys.exit(2)
    import jax
    import jax.numpy as jnp

    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render

    model, opt, cams, width, height = build_bench(n_gaussians=20_000,
                                                  width=512, height=512)
    cam = cams[0]
    kw = dict(active=model.active, width=width, height=height)

    def loss(params, cfg, with_T=True):
        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        out = render(cam, **inputs, **kw, config=cfg)
        img = out["render"]
        l = jnp.sum(img * img)
        if with_T:
            l = l + 0.5 * jnp.sum(out["final_T"])
        return l, img

    base = dict(max_tiles_per_gaussian=16, max_pairs_per_tile=1024, chunk=128)
    cfg_p = RasterConfig(use_pallas=True, **base)
    cfg_x = RasterConfig(use_pallas=False, **base)

    (lp, img_p), gp = jax.value_and_grad(
        lambda p: loss(p, cfg_p), has_aux=True)(model.params)
    (lx, img_x), gx = jax.value_and_grad(
        lambda p: loss(p, cfg_x), has_aux=True)(model.params)
    nan_report("pallas", gp, model.active)
    nan_report("xla", gx, model.active)

    # Without the final_T loss term (ADVICE r3 suspect) — does the NaN vanish?
    _, gp2 = jax.value_and_grad(
        lambda p: loss(p, cfg_p, with_T=False), has_aux=True)(model.params)
    _, gx2 = jax.value_and_grad(
        lambda p: loss(p, cfg_x, with_T=False), has_aux=True)(model.params)
    nan_report("pallas/no-final_T", gp2, model.active)
    nan_report("xla/no-final_T", gx2, model.active)

    # Actual magnitudes for the bit-identity variants (gate printed bools only)
    for tag, extra in [("compact", dict(pair_capacity=512 * 1024)),
                       ("lookahead", dict(dma_lookahead=True)),
                       ("nostats", dict(viewspace_stats=False))]:
        cfg_v = RasterConfig(use_pallas=True, **base, **extra)
        (lv, img_v), gv = jax.value_and_grad(
            lambda p: loss(p, cfg_v), has_aux=True)(model.params)
        ie = float(jnp.max(jnp.abs(img_v - img_p)))
        print(f"[{tag}] image max|d|={ie:.3e} loss d={float(lv - lp):.3e}")
        for (k, a), (_, b) in zip(gv._asdict().items(), gp._asdict().items()):
            if b.size == 0:
                continue
            d = float(jnp.max(jnp.abs(a - b)))
            denom = float(jnp.max(jnp.abs(b))) + 1e-6
            if d != 0.0:
                print(f"  grad {k}: max|d|={d:.3e} rel={d / denom:.3e}")
    print("probe done")


if __name__ == "__main__":
    main()
