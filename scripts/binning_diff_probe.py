#!/usr/bin/env python
"""Parity-gate forensics, round 4: do the two paths composite the SAME pairs?

All per-op numerics are clean on hardware (mosaic_precision_probe,
cumsum_precision_probe) and latch flips are impossible on the gate scene
(latch_flip_cpu_evidence). The last untested difference between the paths
is pair CONTENT: the pallas path bins via bin_gaussians_sorted (paged sort
layout) and the XLA oracle via bin_gaussians ((NT,K) gather layout) — two
independent implementations of the budget/cull/overflow policy. A pair
dropped by one path but kept by the other contributes up to
alpha * T * |feat| to the diff; borderline pairs sit right at
alpha_min = 1/255 = 3.9e-3 — EXACTLY the 2.78e-3 error scale the gate
measures, and invisible to the CPU pytest fixtures (no borderline pairs)
and to latch_flip_cpu_evidence (XLA-vs-naive share one binning).

Runs entirely on CPU (both binnings are plain XLA): compares per-tile pair
sets, and for each asymmetric pair computes its max f64 alpha over the
tile's pixels — the image-impact bound. No pallas, no chip.
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

    print(f"pallas binning: overflow_pairs={int(sb.overflow_pairs)} "
          f"overflow_tiles={int(sb.overflow_tiles)} "
          f"overflow_capacity={int(sb.overflow_capacity)}", flush=True)
    print(f"xla    binning: overflow_pairs={int(b.overflow_pairs)} "
          f"overflow_tiles={int(b.overflow_tiles)}", flush=True)

    xy = np.asarray(prep.xy, np.float64)
    con = np.asarray(prep.conic, np.float64)
    opa = np.asarray(opa_eff, np.float64)

    def max_alpha_in_tile(g, t):
        ox, oy = (t % grid_w) * ts, (t // grid_w) * ts
        pxs = np.arange(ox, ox + ts, dtype=np.float64)
        pys = np.arange(oy, oy + ts, dtype=np.float64)
        dx = xy[g, 0] - pxs[None, :]
        dy = xy[g, 1] - pys[:, None]
        power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                 - con[g, 1] * dx * dy)
        power = np.where(power <= 0, power, -np.inf)
        return float(np.max(opa[g] * np.exp(power)))

    num_tiles = grid_w * grid_h
    n_diff_tiles = 0
    only_p_total = only_x_total = 0
    impact = []  # (alpha_bound, tile, gauss, side)
    order_mismatch = 0
    for t in range(num_tiles):
        s, c = int(starts[t]), int(counts[t])
        gp = paged_src[s:s + c] // r_max
        gp = gp[gp < n]
        gx = gid[t][pv[t]]
        sp, sx = Counter(gp.tolist()), Counter(gx.tolist())
        if sp == sx:
            if gp.tolist() != gx.tolist():
                order_mismatch += 1
            continue
        n_diff_tiles += 1
        only_p = sp - sx
        only_x = sx - sp
        only_p_total += sum(only_p.values())
        only_x_total += sum(only_x.values())
        for g in only_p:
            impact.append((max_alpha_in_tile(g, t), t, g, "pallas-only"))
        for g in only_x:
            impact.append((max_alpha_in_tile(g, t), t, g, "xla-only"))

    print(f"tiles compared={num_tiles} content-diff tiles={n_diff_tiles} "
          f"pallas-only pairs={only_p_total} xla-only pairs={only_x_total} "
          f"same-set-diff-order tiles={order_mismatch}", flush=True)
    impact.sort(reverse=True)
    for a, t, g, side in impact[:12]:
        print(f"  {side}: tile={t} gauss={g} max_alpha_in_tile={a:.3e} "
              f"depth={float(prep.depth[g]):.4f}", flush=True)
    if impact:
        bound = sum(a for a, *_ in impact)
        print(f"total |image| impact bound (sum of max alphas, T<=1): "
              f"{bound:.3e}; max single: {impact[0][0]:.3e}", flush=True)


if __name__ == "__main__":
    main()
