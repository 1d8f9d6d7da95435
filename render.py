#!/usr/bin/env python
"""Offline render sets from a trained checkpoint.

Parity target: reference render.py:25-152 — render for every camera: rgb,
foreground-only rgb (cleaned model), mask, inverse-masked rgb, and an
orientation-map HSV visualization; written under
model_path/<set_name>/iteration_N/.
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np

from hairgs_tpu.config import (
    GeneralConfig,
    ModelConfig,
    OptimizationConfig,
    RuntimeConfig,
    add_config_args,
    extract_config,
    get_combined_args,
)


def orientation_to_hsv(theta: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """theta in [0,pi) -> HSV hue wheel rgb (utils/visualization.py:251-269)."""
    import colorsys

    h, w = theta.shape
    out = np.zeros((h, w, 3), dtype=np.float32)
    hue = theta / np.pi
    flat = hue.reshape(-1)
    rgb = np.stack([np.vectorize(lambda x, c=c: colorsys.hsv_to_rgb(x, 1, 1)[c])(flat)
                    for c in range(3)], axis=1)
    out = rgb.reshape(h, w, 3) * mask[..., None]
    return out


def render_sets(args):
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.models.hair import HairModel, hair_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render
    from hairgs_tpu.scene import Scene

    rt = extract_config(args, RuntimeConfig)
    scene = Scene(args, shuffle=False, capacity_round=rt.capacity_round)
    model = scene.gaussians
    is_hair = isinstance(model, HairModel)
    cameras = scene.get_cameras()
    import jax

    use_pallas = rt.use_pallas
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    cfg = RasterConfig(max_tiles_per_gaussian=rt.max_tiles_per_gaussian,
                       max_pairs_per_tile=rt.max_pairs_per_tile,
                       chunk=rt.composite_chunk,
                       use_pallas=bool(use_pallas) and use_pallas != "false")

    out_root = args.model_path
    it = scene.loaded_iter
    sets = ["rgb", "mask", "rgb_masked", "orientation", "rgb_foreground"]
    for s in sets:
        os.makedirs(os.path.join(out_root, s, f"iteration_{it}"), exist_ok=True)

    # foreground-only render from a CLEANED copy of the model (reference
    # render.py renders the foreground set after clean_gaussians)
    import copy

    fg_model = copy.deepcopy(model)
    if is_hair:
        from hairgs_tpu.topo.graph_ops import clean_hair_gaussians

        clean_hair_gaussians(fg_model)
        fg_active = fg_model.graph.seg_active
    else:
        fg_model.clean_gaussians()
        fg_active = fg_model.active

    for idx, cam in enumerate(cameras):
        if is_hair:
            inputs = hair_render_inputs(
                model.params, model.graph, cam.cam_center, model.active_sh_degree,
                model.dist_to_scale_factor,
            )
            active = model.graph.seg_active
        else:
            inputs = gaussian_render_inputs(model.params, cam.cam_center,
                                            model.active_sh_degree)
            active = model.active
        out = render(cam, **inputs, active=active, width=cam.width,
                     height=cam.height, config=cfg)
        img = np.asarray(out["render"])
        rgb = np.clip(img[..., :3], 0, 1)
        mask = np.clip(img[..., 3], 0, 1)
        o_world = img[..., 4:7]
        wv = np.asarray(cam.world_view)
        o_view = o_world @ wv[:3, :3].T
        xy = o_view[..., :2]
        xy = xy / (np.linalg.norm(xy, axis=-1, keepdims=True) + 1e-7)
        y = np.where(xy[..., 1] < 1e-7, xy[..., 1] + 1e-7, xy[..., 1])
        theta = np.arctan2(xy[..., 0], y)
        theta = np.where(theta < 0, theta + np.pi, theta)
        binmask = mask > 0.5

        def save(name, arr):
            path = os.path.join(out_root, name, f"iteration_{it}", f"{idx:05d}.png")
            PILImage.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)

        save("rgb", rgb)
        save("mask", np.repeat(mask[..., None], 3, axis=2))
        save("rgb_masked", rgb * binmask[..., None])
        save("orientation", orientation_to_hsv(theta, binmask.astype(np.float32)))

        if is_hair:
            fg_inputs = hair_render_inputs(
                fg_model.params, fg_model.graph, cam.cam_center,
                fg_model.active_sh_degree, fg_model.dist_to_scale_factor,
            )
        else:
            fg_inputs = gaussian_render_inputs(fg_model.params, cam.cam_center,
                                               fg_model.active_sh_degree)
        fg_out = render(cam, **fg_inputs, active=fg_active, width=cam.width,
                        height=cam.height, config=cfg)
        save("rgb_foreground", np.clip(np.asarray(fg_out["render"][..., :3]), 0, 1))
        print(f"rendered camera {idx + 1}/{len(cameras)}")
    print(f"Render sets written under {out_root}")


if __name__ == "__main__":
    parser = ArgumentParser(description="Render script parameters")
    add_config_args(parser, ModelConfig)
    add_config_args(parser, OptimizationConfig)
    add_config_args(parser, GeneralConfig)
    add_config_args(parser, RuntimeConfig)
    args = get_combined_args(parser, sys.argv[1:])
    render_sets(args)
