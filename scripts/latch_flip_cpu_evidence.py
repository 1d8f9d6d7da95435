#!/usr/bin/env python
"""CPU evidence for the parity-gate error model (no TPU needed).

Compares TWO legitimate implementations of the CUDA compositor semantics on
the exact parity-gate scene, both running on CPU in f32:

  - the XLA chunked compositor (composite.py: log1p/exp prefix transmittance,
    the path the parity gate uses as its oracle), and
  - composite_naive (composite.py:215-272: literal sequential
    T *= (1 - alpha) CUDA loop semantics, a THIRD association order).

Both implement `alpha = min(0.99, o*exp(power)); skip alpha < alpha_min;
stop when T < 1e-4` exactly. If the T_EPS saturation latch flipping under
f32 evaluation-order drift is the true source of the pallas-vs-XLA
differences seen on hardware, then these two CPU paths must ALSO disagree
at the same magnitude, confined to saturated pixels — proving the error is
intrinsic to comparing ANY two evaluation orders of the latched compositor,
not a Mosaic compilation bug.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from bench import build_bench  # noqa: E402
from hairgs_tpu.models.gaussian import gaussian_render_inputs  # noqa: E402
from hairgs_tpu.render.composite import T_EPS, composite_naive  # noqa: E402
from hairgs_tpu.render.preprocess import preprocess  # noqa: E402
from hairgs_tpu.render.renderer import RasterConfig, render  # noqa: E402


def split_stats(name, img_a, img_b, t_a, t_b):
    d = jnp.max(jnp.abs(img_a - img_b), axis=-1)
    sat = jnp.maximum(t_a, t_b) < 2 * T_EPS
    d_unsat = jnp.where(sat, 0.0, d)
    flat = jnp.sort(d.reshape(-1))
    n = flat.shape[0]
    print(f"[{name}] max={float(jnp.max(d)):.2e} "
          f"p99.99={float(flat[int(n * 0.9999)]):.2e} "
          f"n>1e-4={int(jnp.sum(d > 1e-4))} n>1e-3={int(jnp.sum(d > 1e-3))} "
          f"sat_px={int(jnp.sum(sat))} "
          f"max_unsat={float(jnp.max(d_unsat)):.2e} "
          f"n_unsat>1e-4={int(jnp.sum(d_unsat > 1e-4))}", flush=True)


def main():
    model, opt, cams, width, height = build_bench(n_gaussians=20_000,
                                                  width=512, height=512)
    cam = cams[0]
    cfg = RasterConfig(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                       chunk=128, use_pallas=False)
    inputs = gaussian_render_inputs(model.params, cam.cam_center, 0)
    out = render(cam, **inputs, active=model.active, width=width,
                 height=height, config=cfg)
    print(f"overflow pairs/tiles: {int(out['overflow_pairs'])} "
          f"{int(out['overflow_tiles'])}", flush=True)

    prep = preprocess(inputs["means3d"], inputs["scales"],
                      inputs["rotations"], cam, width, height, cfg.tile_size,
                      opacity=inputs["opacity"],
                      antialiasing=cfg.antialiasing)
    img_n, t_n = composite_naive(prep.xy, prep.conic, inputs["opacity"],
                                 inputs["features"], prep.depth, prep.valid,
                                 width, height, rect=prep.rect,
                                 tile_size=cfg.tile_size)
    split_stats("xla-vs-naive", out["render"], img_n, out["final_T"], t_n)


if __name__ == "__main__":
    main()
