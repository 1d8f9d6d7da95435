"""Visual probe: render checkpoints of a scene next to GT inside the hair
mask (CPU, XLA compositor) — evidence artifacts for quality post-mortems.

Writes docs/probes/<tag>_render.png (+ a single side-by-side crop strip
<tag>_strip.png of GT | renders) for the requested checkpoints.

Usage:
  python scripts/probe_render_crops.py <source_dir> <tag> <ply> [<ply> ...]
e.g.
  python scripts/probe_render_crops.py _runs/syn150_512/data s3_postmortem \
      _runs/syn150_512/model/point_cloud/iteration_30017/point_cloud.ply \
      _runs/syn150_512/model/point_cloud/iteration_62017/point_cloud.ply
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def save_png(path, arr):
    from PIL import Image

    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def main():
    src, tag = sys.argv[1], sys.argv[2]
    plys = sys.argv[3:]
    import jax.numpy as jnp

    from hairgs_tpu.io.dataset import load_camera, read_colmap_scene_info
    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.models.hair import HairModel, hair_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render

    scene_info = read_colmap_scene_info(src, "images")
    cam = load_camera(scene_info.cameras[0])
    gt = np.asarray(cam.image)
    mask = np.asarray(cam.mask) if cam.mask is not None else None

    # crop to the mask bounding box (pad 8px)
    if mask is not None:
        ys, xs = np.where(mask > 0.5)
        y0, y1 = max(ys.min() - 8, 0), min(ys.max() + 8, gt.shape[0])
        x0, x1 = max(xs.min() - 8, 0), min(xs.max() + 8, gt.shape[1])
    else:
        y0, y1, x0, x1 = 0, gt.shape[0], 0, gt.shape[1]

    os.makedirs("docs/probes", exist_ok=True)
    panels = [gt[y0:y1, x0:x1]]
    save_png(f"docs/probes/{tag}_gt.png", panels[0])
    cfg = RasterConfig()
    for ply in plys:
        from hairgs_tpu.evaluation.eval_data import count_ply_elements

        name = os.path.basename(os.path.dirname(ply)) or os.path.basename(ply)
        if count_ply_elements(ply) == 1:
            from hairgs_tpu.models.gaussian import GaussianModel

            m = GaussianModel(sh_degree=0)
            m.load_ply(ply)
            inputs = gaussian_render_inputs(m.params, cam.cam_center,
                                            m.active_sh_degree)
            active = m.active
        else:
            m = HairModel(sh_degree=0)
            m.load_ply(ply)
            inputs = hair_render_inputs(m.params, m.graph, cam.cam_center,
                                        m.active_sh_degree,
                                        m.dist_to_scale_factor)
            active = m.graph.seg_active
        out = render(cam, **inputs, active=active, width=cam.width,
                     height=cam.height, config=cfg)
        img = np.asarray(jnp.clip(out["render"][..., :3], 0.0, 1.0))
        crop = img[y0:y1, x0:x1]
        panels.append(crop)
        save_png(f"docs/probes/{tag}_{name}.png", crop)
        inside = (np.abs(img - gt).mean(-1) * (mask > 0.5)).sum() / max(
            (mask > 0.5).sum(), 1) if mask is not None else float("nan")
        print(f"{name}: mean|err| inside mask = {inside:.4f}  "
              f"mean intensity inside = "
              f"{(img.mean(-1) * (mask > 0.5)).sum() / max((mask > 0.5).sum(), 1):.4f}")
    strip = np.concatenate(
        [np.pad(p, ((0, 0), (0, 4), (0, 0)), constant_values=1.0)
         for p in panels], axis=1)
    save_png(f"docs/probes/{tag}_strip.png", strip)
    print(f"wrote docs/probes/{tag}_strip.png "
          f"({len(panels)} panels, crop {y1-y0}x{x1-x0})")


if __name__ == "__main__":
    main()
