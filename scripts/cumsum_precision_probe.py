#!/usr/bin/env python
"""Micro-probe 2: is XLA:TPU's jnp.cumsum the imprecise side of the gate?

mosaic_precision_probe.py (run on hardware, 2026-08-19) showed Mosaic DOES
honor precision=HIGHEST (dot rel-vs-f64 9.1e-8, bit-identical to XLA:TPU
HIGHEST) and exp/log1p are bit-identical across pallas/XLA — refuting both
the "Mosaic ignores HIGHEST" model and the hand-split _dot32 it motivated.
Both compositor paths use the SAME log-space math (composite.py:109-116 vs
pallas_composite.py), so the 2.78e-3 image gap must come from the one op
that differs: the prefix sum — triangular HIGHEST matmul (pallas) vs
jnp.cumsum (XLA oracle). XLA:TPU is known to lower cumsum via a
reduce-window/matmul strategy that can run at DEFAULT (bf16-operand) MXU
precision; the probe's DEFAULT dot measured 1.07e-3 rel, the right scale
for the observed 2.78e-3.

Measures, on log1p(-alpha)-scale rows (the compositor's actual operand
distribution), rel-vs-f64 for: jnp.cumsum, cumsum under
jax_default_matmul_precision=float32, associative_scan, and the HIGHEST
triangular matmul the pallas kernel uses. Shared-chip safe (tiny compiles,
numerics only).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # chunk=128 rows as the kernels slice them: l = log1p(-alpha) in
    # [-4.6, 0] (alpha <= 0.99), many small entries like a real tile
    L = rng.uniform(-0.12, 0.0, (256, 128)).astype(np.float32)
    L[:, ::7] = rng.uniform(-4.6, -0.5, L[:, ::7].shape).astype(np.float32)
    g64 = np.cumsum(L.astype(np.float64), axis=1)

    def rel(a):
        return float(np.max(np.abs(np.asarray(a, np.float64) - g64)
                            / (np.abs(g64) + 1e-30)))

    Lj = jnp.asarray(L)
    c_def = jax.jit(lambda x: jnp.cumsum(x, axis=1))(Lj)

    with jax.default_matmul_precision("float32"):
        c_f32 = jax.jit(lambda x: jnp.cumsum(x, axis=1))(Lj)

    c_ascan = jax.jit(lambda x: jax.lax.associative_scan(
        jnp.add, x, axis=1))(Lj)

    tri = jnp.asarray(np.triu(np.ones((128, 128), np.float32)))
    c_mm = jax.jit(lambda x: jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST))(Lj)

    print(f"cumsum rel-vs-f64: default={rel(c_def):.2e} "
          f"matmul_prec_f32={rel(c_f32):.2e} "
          f"assoc_scan={rel(c_ascan):.2e} "
          f"tri-matmul HIGHEST={rel(c_mm):.2e}", flush=True)
    print(f"cumsum default-vs-f32ctx bitdiff="
          f"{int(np.sum(np.asarray(c_def) != np.asarray(c_f32)))}",
          flush=True)
    # the exp amplification the compositor sees: T = exp(cum)
    e_def = np.exp(np.asarray(c_def, np.float64))
    e_mm = np.exp(np.asarray(c_mm, np.float64))
    e_g = np.exp(g64)
    print(f"exp(cum) rel err: xla-cumsum={float(np.max(np.abs(e_def - e_g) / (e_g + 1e-30))):.2e} "
          f"tri-matmul={float(np.max(np.abs(e_mm - e_g) / (e_g + 1e-30))):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
