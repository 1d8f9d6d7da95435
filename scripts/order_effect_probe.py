#!/usr/bin/env python
"""Parity-gate forensics, round 5: quantify the compositing-order effect.

binning_diff_probe.py showed the two paths bin IDENTICAL pair sets but 17
tiles order near-depth-ties differently (pallas: ~20-bit quantized depth
key, stable by gaussian index; XLA oracle: exact float depth). Compositing
is order-dependent — swapping two overlapping pairs changes a pixel at
alpha_i*alpha_j*|f_i-f_j| scale. This composites every order-mismatched
tile's pair list BOTH ways in f64 on the host and reports the max image
delta. If it reproduces the ~2.7e-3 the on-TPU gate measures, the gate
"FAIL" is two legal orderings of depth ties, not a Mosaic bug.
"""

import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from bench import build_bench  # noqa: E402
from hairgs_tpu.models.gaussian import gaussian_render_inputs  # noqa: E402
from hairgs_tpu.render.binning import (  # noqa: E402
    bin_gaussians,
    bin_gaussians_sorted,
)
from hairgs_tpu.render.preprocess import preprocess  # noqa: E402
from hairgs_tpu.render.renderer import RasterConfig  # noqa: E402


def composite_tile_f64(order, t, grid_w, ts, xy, con, opa, feat):
    ox, oy = (t % grid_w) * ts, (t // grid_w) * ts
    pxs = (ox + np.arange(ts))[None, :].astype(np.float64)
    pys = (oy + np.arange(ts))[:, None].astype(np.float64)
    T = np.ones((ts, ts))
    rgb = np.zeros((ts, ts, feat.shape[1]))
    for g in order:
        dx = xy[g, 0] - pxs
        dy = xy[g, 1] - pys
        power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                 - con[g, 1] * dx * dy)
        alpha = np.minimum(0.99, opa[g] * np.exp(np.minimum(power, 0.0)))
        alpha = np.where((power <= 0) & (alpha >= 1.0 / 255.0), alpha, 0.0)
        live = T * (1.0 - alpha) >= 1e-4
        a_eff = np.where(live, alpha, 0.0)
        rgb += (a_eff * T)[..., None] * feat[g]
        T = T * (1.0 - a_eff)
    return rgb, T


def main():
    model, opt, cams, width, height = build_bench(n_gaussians=20_000,
                                                  width=512, height=512)
    cam = cams[0]
    cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                       chunk=128)
    ts = cfg.tile_size
    grid_w = (width + ts - 1) // ts
    grid_h = (height + ts - 1) // ts

    inputs = gaussian_render_inputs(model.params, cam.cam_center, 0)
    prep = preprocess(inputs["means3d"], inputs["scales"],
                      inputs["rotations"], cam, width, height, ts,
                      active=model.active, opacity=inputs["opacity"],
                      alpha_min=cfg.alpha_min)
    opa_eff = jnp.where(prep.valid, inputs["opacity"], 0.0)
    q_cut = jnp.log(jnp.maximum(opa_eff, 1e-12) / cfg.alpha_min)
    kw = dict(xy=prep.xy, conic=prep.conic, q_cut=q_cut, tile_size=ts)

    sb = bin_gaussians_sorted(prep.rect, prep.depth, prep.valid, grid_w,
                              grid_h, cfg.max_tiles_per_gaussian,
                              cfg.max_pairs_per_tile, cfg.chunk, **kw)
    b = bin_gaussians(prep.rect, prep.depth, prep.valid, grid_w, grid_h,
                      cfg.max_tiles_per_gaussian, cfg.max_pairs_per_tile,
                      **kw)

    r_max = cfg.max_tiles_per_gaussian
    n = int(prep.xy.shape[0])
    paged_src = np.asarray(sb.paged_src)
    starts = np.asarray(sb.starts)
    counts = np.asarray(sb.counts)
    gid = np.asarray(b.gather_idx)
    pv = np.asarray(b.pair_valid)

    xy = np.asarray(prep.xy, np.float64)
    con = np.asarray(prep.conic, np.float64)
    opa = np.asarray(opa_eff, np.float64)
    feat = np.asarray(inputs["features"], np.float64)
    feat = np.where(np.asarray(prep.valid)[:, None], feat, 0.0)

    worst = 0.0
    num_tiles = grid_w * grid_h
    n_mismatch = 0
    for t in range(num_tiles):
        s, c = int(starts[t]), int(counts[t])
        gp = paged_src[s:s + c] // r_max
        gp = gp[gp < n]
        gx = gid[t][pv[t]]
        if Counter(gp.tolist()) != Counter(gx.tolist()) or \
                gp.tolist() == gx.tolist():
            continue
        n_mismatch += 1
        rgb_p, _ = composite_tile_f64(gp, t, grid_w, ts, xy, con, opa, feat)
        rgb_x, _ = composite_tile_f64(gx, t, grid_w, ts, xy, con, opa, feat)
        d = float(np.max(np.abs(rgb_p - rgb_x)))
        worst = max(worst, d)
        if d > 1e-5:
            print(f"  tile {t} ({t % grid_w},{t // grid_w}): "
                  f"pairs={len(gp)} f64 order-effect max|d|={d:.2e}",
                  flush=True)
    print(f"order-mismatched tiles composited: {n_mismatch}; "
          f"max f64 image delta from ordering alone: {worst:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
