#!/usr/bin/env python
"""Renderer A/B micro-benchmark (forward and forward+backward).

Environment rules baked in (CLAUDE.md): the axon TPU platform caches
identical executions, so every timed call uses a different camera; jit
compiles are minutes each through the remote helper, so each invocation
compiles ONE variant (select with --variant) and times it with batched
probes.

Usage:
  python scripts/bench_render.py --variant baseline
  python scripts/bench_render.py --variant chunk256 --profile
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_scene(n_gaussians, width, height, seed=0):
    import jax.numpy as jnp

    from hairgs_tpu.core.camera import make_camera
    from hairgs_tpu.models.gaussian import GaussianModel, gaussian_render_inputs

    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.11, (n_gaussians, 3)).astype(np.float32)
    pts[:, 2] = 0.55 + rng.normal(0, 0.05, n_gaussians)
    colors = rng.uniform(0.05, 0.95, (n_gaussians, 3)).astype(np.float32)
    model = GaussianModel(sh_degree=0, capacity_round=4096)
    model.create_from_pcd(pts, colors)
    arrays = model.host_arrays()
    arrays["scaling"] = np.log(
        rng.uniform(5e-4, 3e-3, (n_gaussians, 3))
    ).astype(np.float32)
    model._install(arrays, n_gaussians, moments=model.host_moments(), step=0)

    cams = []
    for i in range(16):
        a = 0.02 * i  # slightly different view per probe (defeats the
        #               identical-execution cache of the axon runtime)
        R = np.array([
            [np.cos(a), 0, np.sin(a)],
            [0, 1, 0],
            [-np.sin(a), 0, np.cos(a)],
        ])
        cams.append(make_camera(R, np.zeros(3), fovx=1.2, fovy=1.0))
    target = jnp.asarray(
        rng.uniform(0, 1, (height, width, 7)).astype(np.float32))
    return model, cams, target


VARIANTS = {
    "baseline": dict(max_tiles_per_gaussian=16, max_pairs_per_tile=2048,
                     chunk=128),
    "tiles8": dict(max_tiles_per_gaussian=8, max_pairs_per_tile=2048,
                   chunk=128),
    "chunk256": dict(max_tiles_per_gaussian=16, max_pairs_per_tile=2048,
                     chunk=256),
    "chunk512": dict(max_tiles_per_gaussian=16, max_pairs_per_tile=2048,
                     chunk=512),
    "pairs1024": dict(max_tiles_per_gaussian=16, max_pairs_per_tile=1024,
                      chunk=128),
    "xla": dict(max_tiles_per_gaussian=16, max_pairs_per_tile=2048,
                chunk=128, use_pallas=False),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="baseline",
                        choices=sorted(VARIANTS))
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--width", type=int, default=999)
    parser.add_argument("--height", type=int, default=1000)
    parser.add_argument("--probes", type=int, default=12)
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--mode", default="both",
                        choices=["fwd", "fwdbwd", "both"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render

    cfg_kwargs = dict(VARIANTS[args.variant])
    use_pallas = cfg_kwargs.pop("use_pallas",
                                jax.default_backend() == "tpu")
    cfg = RasterConfig(use_pallas=use_pallas, **cfg_kwargs)
    model, cams, target = build_scene(args.n, args.width, args.height)

    def fwd(params, camera):
        inputs = gaussian_render_inputs(params, camera.cam_center, 0)
        out = render(camera, **inputs, active=model.active,
                     width=args.width, height=args.height, config=cfg)
        return out["render"].sum()

    def loss(params, camera):
        inputs = gaussian_render_inputs(params, camera.cam_center, 0)
        out = render(camera, **inputs, active=model.active,
                     width=args.width, height=args.height, config=cfg)
        a = jnp.mean((out["render_photo"] - target) ** 2)
        b = jnp.mean(jnp.abs(out["render"][..., 3] - target[..., 3]))
        return a + b

    jf = jax.jit(fwd)
    jg = jax.jit(jax.grad(loss))

    def timeit(fn, label):
        t0 = time.perf_counter()
        fn(model.params, cams[0]).block_until_ready()
        print(f"{label}: compile+1st {time.perf_counter() - t0:.1f}s")
        outs = []
        t0 = time.perf_counter()
        for i in range(args.probes):
            outs.append(fn(model.params, cams[1 + i % 15]))
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.probes * 1000
        print(f"{label}: {dt:.2f} ms/call  [{args.variant}]")
        return dt

    if args.profile:
        jax.profiler.start_trace("/tmp/bench_trace")
    if args.mode in ("fwd", "both"):
        timeit(lambda p, c: jf(p, c), "fwd")
    if args.mode in ("fwdbwd", "both"):
        timeit(lambda p, c: jg(p, c).xyz, "fwd+bwd")
    if args.profile:
        jax.profiler.stop_trace()
        print("trace in /tmp/bench_trace")


if __name__ == "__main__":
    main()
