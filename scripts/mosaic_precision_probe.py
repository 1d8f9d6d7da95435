#!/usr/bin/env python
"""Micro-probe: which TPU op injects the ~2.7e-3 pallas-vs-XLA error?

Round-5 CPU forensics (latch_flip_cpu_evidence.py) refuted the latch-flip
model: the gate scene saturates NO pixels and any-two-association-orders
agree to 1.8e-7 on CPU. So the 2.78e-3 image err on hardware is a
systematic per-op precision loss in the Mosaic-compiled path — the scale of
ONE bf16-rounded product (2^-9). Suspects, each tested in isolation against
f64 ground truth:

  1. Mosaic dot_general with precision=HIGHEST — is the attribute honored,
     or does the MXU still round f32 operands to bf16 (DEFAULT semantics)?
  2. Mosaic jnp.exp / jnp.log1p elementwise (VPU transcendental approx) vs
     the XLA:TPU lowering of the same.
  3. XLA:TPU dot at HIGHEST (oracle-side sanity).

Run on the real chip (one tiny compile, shared-chip safe — numerics only).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    # log1p(-alpha)-like magnitudes and compositor-like values
    A = rng.uniform(-0.05, 0.0, (256, 128)).astype(np.float32)
    B = (rng.uniform(0, 1, (128, 128)) < 0.5).astype(np.float32)
    x = rng.uniform(-9.0, 0.0, (8, 128)).astype(np.float32)
    al = rng.uniform(0.0, 0.99, (8, 128)).astype(np.float32)

    def kernel(a_ref, b_ref, x_ref, al_ref, oh_ref, od_ref, oe_ref, ol_ref):
        oh_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        od_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        oe_ref[:] = jnp.exp(x_ref[:])
        ol_ref[:] = jnp.log1p(-al_ref[:])

    interpret = jax.default_backend() != "tpu"  # CPU smoke-run support
    if interpret:
        print("NOTE: non-TPU backend — interpret mode (validates the script, "
              "not Mosaic)", flush=True)
    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((256, 128), jnp.float32),
            jax.ShapeDtypeStruct((256, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(A, B, x, al)
    p_hi, p_def, p_exp, p_l1p = map(np.asarray, outs)

    # XLA:TPU versions of the same ops
    x_hi = np.asarray(jnp.dot(jnp.asarray(A), jnp.asarray(B),
                              precision=jax.lax.Precision.HIGHEST))
    x_def = np.asarray(jnp.dot(jnp.asarray(A), jnp.asarray(B)))
    x_exp = np.asarray(jnp.exp(jnp.asarray(x)))
    x_l1p = np.asarray(jnp.log1p(jnp.asarray(-al)))

    # f64 ground truth on host
    g_dot = (A.astype(np.float64) @ B.astype(np.float64))
    g_exp = np.exp(x.astype(np.float64))
    g_l1p = np.log1p(-al.astype(np.float64))

    def rel(a, g):
        return float(np.max(np.abs(a - g) / (np.abs(g) + 1e-30)))

    print(f"dot rel-vs-f64: pallas HIGHEST={rel(p_hi, g_dot):.2e} "
          f"pallas DEFAULT={rel(p_def, g_dot):.2e} "
          f"xla HIGHEST={rel(x_hi, g_dot):.2e} "
          f"xla DEFAULT={rel(x_def, g_dot):.2e}", flush=True)
    print(f"dot pallasHIGH-vs-xlaHIGH max|d|="
          f"{float(np.max(np.abs(p_hi - x_hi))):.2e}", flush=True)
    print(f"exp rel-vs-f64: pallas={rel(p_exp, g_exp):.2e} "
          f"xla={rel(x_exp, g_exp):.2e} "
          f"bitdiff={int(np.sum(p_exp != x_exp))}/{p_exp.size}", flush=True)
    print(f"log1p rel-vs-f64: pallas={rel(p_l1p, g_l1p):.2e} "
          f"xla={rel(x_l1p, g_l1p):.2e} "
          f"bitdiff={int(np.sum(p_l1p != x_l1p))}/{p_l1p.size}", flush=True)


if __name__ == "__main__":
    main()
