#!/usr/bin/env python
"""Parity-gate forensics, round 3: spatially localize the 2.78e-3 image gap
and identify the GUILTY side with an f64 host oracle.

Evidence so far (all on the real chip, 2026-08-19):
  - mosaic_precision_probe.py: Mosaic honors precision=HIGHEST (dot 9.1e-8
    rel-vs-f64, bit-identical to XLA HIGHEST); exp/log1p bit-identical
    pallas-vs-XLA (log1p itself carries 3.4e-4 rel-vs-f64 on this VPU, but
    identically on both sides, so it cancels in the parity diff).
  - cumsum_precision_probe.py: XLA:TPU cumsum is 5.8e-7 rel-vs-f64 — the
    oracle's prefix sums are NOT a default-precision matmul lowering.
  - latch_flip_cpu_evidence.py: the gate scene saturates no pixels, so
    T_EPS liveness flips cannot occur on it.

Every per-op and order-dependence model is now refuted; this probe stops
theorizing and measures: renders the gate scene both ways on TPU, pulls the
diff image, prints its spatial structure (broad-systematic vs isolated
pixels), then recomposites the worst pixels on the host in f64 from the
pulled pair tables to name the side that diverges from ground truth.
Shared-chip safe (the two renders are the same programs the 05:06 gate
compiled — cache hits).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench
    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render

    model, opt, cams, width, height = build_bench(n_gaussians=20_000,
                                                  width=512, height=512)
    cam = cams[0]
    kw = dict(active=model.active, width=width, height=height)

    def run(use_pallas):
        cfg = RasterConfig(max_tiles_per_gaussian=16,
                           max_pairs_per_tile=1024,
                           chunk=128, use_pallas=use_pallas)
        inputs = gaussian_render_inputs(model.params, cam.cam_center, 0)
        out = render(cam, **inputs, **kw, config=cfg)
        return out

    out_p = run(True)
    out_x = run(False)
    img_p = np.asarray(out_p["render"], np.float64)
    img_x = np.asarray(out_x["render"], np.float64)
    t_p = np.asarray(out_p["final_T"], np.float64)
    t_x = np.asarray(out_x["final_T"], np.float64)

    d = np.max(np.abs(img_p - img_x), axis=-1)
    flat = np.sort(d.reshape(-1))
    n = flat.size
    print(f"image max err {d.max():.2e} p99.99={flat[int(n * 0.9999)]:.2e} "
          f"p99={flat[int(n * 0.99)]:.2e} median={flat[n // 2]:.2e}",
          flush=True)
    for th in (1e-3, 1e-4, 1e-5, 1e-6):
        print(f"  n>|{th:.0e}| = {int(np.sum(d > th))}", flush=True)
    dt = np.abs(t_p - t_x)
    print(f"final_T max err {dt.max():.2e} n>1e-4={int(np.sum(dt > 1e-4))}",
          flush=True)

    # worst pixels: coordinates, tile, both finals
    ys, xs = np.unravel_index(np.argsort(d.reshape(-1))[::-1][:8],
                              d.shape)
    for y, x in zip(ys, xs):
        print(f"  worst px ({y:3d},{x:3d}) tile=({y // 16},{x // 16}) "
              f"d={d[y, x]:.2e} T_p={t_p[y, x]:.3e} T_x={t_x[y, x]:.3e} "
              f"rgb_p={img_p[y, x]} rgb_x={img_x[y, x]}", flush=True)

    # error-vs-depth structure: does |d| correlate with 1 - final_T
    # (compositing depth)? broad systematic per-op error would.
    opac = 1.0 - np.minimum(t_p, 1.0)
    for lo, hi in ((0.0, 0.2), (0.2, 0.5), (0.5, 0.9), (0.9, 1.01)):
        m = (opac >= lo) & (opac < hi)
        if m.sum():
            print(f"  opacity[{lo},{hi}): n={int(m.sum()):7d} "
                  f"max_d={d[m].max():.2e} mean_d={d[m].mean():.2e}",
                  flush=True)

    # f64 host oracle on the worst pixel's tile: recomposite from the
    # preprocessed pair list (host math, exact association order of the
    # chunked compositor is irrelevant at f64 — any order agrees to 1e-12)
    from hairgs_tpu.render.preprocess import preprocess
    from hairgs_tpu.render.binning import build_pair_table

    inputs = gaussian_render_inputs(model.params, cam.cam_center, 0)
    cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                       chunk=128, use_pallas=True)
    pre = preprocess(cam, inputs["xyz"], inputs["opacity"],
                     inputs["scaling"], inputs["rotation"],
                     model.active, width, height, cfg,
                     features=inputs["features"])
    table = build_pair_table(pre, width, height, cfg)
    gid = np.asarray(table.gauss_idx)
    starts = np.asarray(table.tile_starts)
    counts = np.asarray(table.tile_counts)
    xy = np.asarray(pre.means2d, np.float64)
    con = np.asarray(pre.conics, np.float64)
    opa = np.asarray(pre.opacity, np.float64).reshape(-1)
    feat = np.asarray(pre.features, np.float64)

    tiles_x = (width + 15) // 16
    for y, x in zip(ys[:3], xs[:3]):
        t = (y // 16) * tiles_x + (x // 16)
        s, c = int(starts[t]), int(counts[t])
        ids = gid[s:s + c]
        px, py = float(x) + 0.5, float(y) + 0.5
        T = 1.0
        rgb = np.zeros(feat.shape[1])
        nlive = 0
        min_t = 1.0
        for g in ids:
            dx = xy[g, 0] - px
            dy = xy[g, 1] - py
            power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                     - con[g, 1] * dx * dy)
            if power > 0:
                continue
            alpha = min(0.99, opa[g] * np.exp(power))
            if alpha < 1.0 / 255.0:
                continue
            if T < 1e-4:
                break
            rgb += alpha * T * feat[g]
            T *= 1.0 - alpha
            nlive += 1
            min_t = min(min_t, T)
        ep = np.max(np.abs(rgb - img_p[y, x]))
        ex = np.max(np.abs(rgb - img_x[y, x]))
        print(f"  f64 oracle px({y},{x}): n_pairs={c} n_live={nlive} "
              f"T_end={T:.3e} |pallas-f64|={ep:.2e} |xla-f64|={ex:.2e} "
              f"-> guilty: {'pallas' if ep > 3 * ex else 'xla' if ex > 3 * ep else 'both/neither'}",
              flush=True)


if __name__ == "__main__":
    main()
