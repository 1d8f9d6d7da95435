#!/usr/bin/env python
"""Fast pallas-vs-XLA parity check ON REAL TPU (the pytest parity suite runs
the kernels in interpret mode on CPU; this validates the Mosaic compilation
itself after kernel changes). Renders one mid-size scene both ways and
compares images + gradients. Prints PASS/FAIL lines; exits nonzero on FAIL.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from bench import _wait_for_backend

    if not _wait_for_backend(max_wait=900):
        print("FAIL: TPU backend unavailable after 900s of retries")
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
    cfg_p = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                         chunk=128, use_pallas=True)
    cfg_x = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                         chunk=128, use_pallas=False)

    def loss(params, cfg):
        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        out = render(cam, **inputs, **kw, config=cfg)
        img = out["render"]
        return jnp.sum(img * img) + 0.5 * jnp.sum(out["final_T"]), img

    (lp, img_p), gp = jax.value_and_grad(
        lambda p: loss(p, cfg_p), has_aux=True)(model.params)
    (lx, img_x), gx = jax.value_and_grad(
        lambda p: loss(p, cfg_x), has_aux=True)(model.params)
    img_err = float(jnp.max(jnp.abs(img_p - img_x)))
    ok = img_err < 1e-3 and abs(float(lp) - float(lx)) < 1e-2 * max(1.0, abs(float(lx)))
    grad_errs = {}
    for (k, a), (_, b) in zip(gp._asdict().items(), gx._asdict().items()):
        if b.size == 0:  # e.g. the SH-rest plane at sh_degree 0
            continue
        denom = float(jnp.max(jnp.abs(b))) + 1e-6
        rel = float(jnp.max(jnp.abs(a - b))) / denom
        grad_errs[k] = rel
        ok = ok and rel < 5e-3
    print(f"image max err {img_err:.2e}; loss {float(lp):.4f} vs "
          f"{float(lx):.4f}; grad rel errs "
          + " ".join(f"{k}={v:.1e}" for k, v in grad_errs.items()))

    # compact pair table (RasterConfig.pair_capacity): with ample capacity
    # the compact layout must reproduce the worst-case table bit-for-bit on
    # hardware too (the corrective legs run with the adaptive controller on)
    cfg_c = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                         chunk=128, use_pallas=True,
                         pair_capacity=512 * 1024)
    (lc, img_c), gc = jax.value_and_grad(
        lambda p: loss(p, cfg_c), has_aux=True)(model.params)
    compact_err = float(jnp.max(jnp.abs(img_c - img_p)))
    compact_ok = compact_err == 0.0
    for (k, a), (_, b) in zip(gc._asdict().items(), gp._asdict().items()):
        if b.size == 0:
            continue
        d = float(jnp.max(jnp.abs(a - b)))
        compact_ok = compact_ok and d == 0.0
    print(f"compact-table image err {compact_err:.2e} "
          f"(bit-identity {'ok' if compact_ok else 'VIOLATED'})")
    ok = ok and compact_ok

    # DMA lookahead (banked cross-tile prefetch): pure scheduling, must be
    # bit-identical on hardware (interpret mode can't prove the Mosaic
    # semaphore schedule is race-free — this can)
    cfg_la = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                          chunk=128, use_pallas=True, dma_lookahead=True)
    (lla, img_la), gla = jax.value_and_grad(
        lambda p: loss(p, cfg_la), has_aux=True)(model.params)
    la_err = float(jnp.max(jnp.abs(img_la - img_p)))
    la_ok = la_err == 0.0
    for (k, a), (_, b) in zip(gla._asdict().items(), gp._asdict().items()):
        if b.size == 0:
            continue
        la_ok = la_ok and float(jnp.max(jnp.abs(a - b))) == 0.0
    print(f"dma-lookahead image err {la_err:.2e} "
          f"(bit-identity {'ok' if la_ok else 'VIOLATED'})")
    ok = ok and la_ok

    # stats gating (viewspace_stats=False): parameter grads must be
    # untouched when the densification aux rows are compiled out
    cfg_ns = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                          chunk=128, use_pallas=True, viewspace_stats=False)
    _, gns = jax.value_and_grad(
        lambda p: loss(p, cfg_ns), has_aux=True)(model.params)
    stats_ok = True
    for (k, a), (_, b) in zip(gns._asdict().items(), gp._asdict().items()):
        if b.size == 0:
            continue
        d = float(jnp.max(jnp.abs(a - b)))
        stats_ok = stats_ok and d == 0.0
    print(f"stats-gating param grads {'identical' if stats_ok else 'DIFFER'}")
    ok = ok and stats_ok

    # AA + lowered alpha gate: the corrective legs' kernel variant
    # (--antialiasing --alpha_min 1e-5). Pallas-vs-XLA parity at the
    # non-default gate proves the Mosaic compile of that constant is sound
    # before a multi-hour leg depends on it.
    cfg_ap = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                          chunk=128, use_pallas=True, antialiasing=True,
                          alpha_min=1e-5)
    cfg_ax = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                          chunk=128, use_pallas=False, antialiasing=True,
                          alpha_min=1e-5)
    (lap, img_ap), gap = jax.value_and_grad(
        lambda p: loss(p, cfg_ap), has_aux=True)(model.params)
    (lax_, img_ax), gax = jax.value_and_grad(
        lambda p: loss(p, cfg_ax), has_aux=True)(model.params)
    aa_err = float(jnp.max(jnp.abs(img_ap - img_ax)))
    aa_ok = aa_err < 1e-3
    for (k, a), (_, b) in zip(gap._asdict().items(), gax._asdict().items()):
        if b.size == 0:
            continue
        rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-6)
        aa_ok = aa_ok and rel < 5e-3
    print(f"aa+alpha_min image err {aa_err:.2e} "
          f"({'ok' if aa_ok else 'VIOLATED'})")
    ok = ok and aa_ok

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
