"""hairgs_tpu — a TPU-native JAX/Pallas framework for hair strand reconstruction
with 3D Gaussian Splatting.

Re-designed from scratch for TPU (jax / XLA / pallas / pjit) with the same
capabilities as the reference CUDA/PyTorch implementation of
"Hair Strand Reconstruction based on 3D Gaussian Splatting" (BMVC 2025):

- Stage I:  standard 3DGS fit with a learnable per-Gaussian hair-mask channel.
- Stage II: conversion of anisotropic Gaussians to line segments and greedy
            merging into polyline strands.
- Stage III: direct endpoint optimization of the strand graph with
            photometric + strand regularizer losses and topology operations.

Design stance (TPU-first, not a port):
- fixed-shape capacity-padded arenas with active masks instead of
  realloc-per-densify;
- a single fused multi-channel differentiable rasterizer (rgb+mask+orientation
  in one pass) built on sort-based binning + per-tile compositing with a
  custom VJP (sorted segment ops instead of atomics);
- data parallelism over camera views via jax.sharding.Mesh + ICI collectives.
"""

__version__ = "0.1.0"
