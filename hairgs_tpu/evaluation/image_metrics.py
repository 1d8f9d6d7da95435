"""Image-quality metrics (PSNR / SSIM) over a camera set.

The reference repo never computes PSNR (its eval surface is strand geometry
only, loss/metrics.py:88-173); the acceptance target for this rebuild is
"PSNR within 0.3 dB", so image metrics are a first-class eval here. Renders
every camera once through the fused renderer and reports full-frame PSNR,
hair-masked PSNR, and SSIM, averaged over cameras.
"""

from typing import Dict, Optional

import numpy as np


def evaluate_image_metrics(model, cameras, config=None,
                           max_cameras: Optional[int] = None) -> Dict[str, float]:
    """Render each camera and compare to its GT image.

    Returns {"psnr", "masked_psnr", "ssim"} means over the camera set
    (masked_psnr only when cameras carry masks). Renders are clipped to
    [0,1] before comparison, matching standard 3DGS eval practice.
    """
    import jax
    import jax.numpy as jnp

    from hairgs_tpu.losses.photometric import masked_psnr, psnr
    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.models.hair import HairModel, hair_render_inputs
    from hairgs_tpu.ops.ssim import ssim
    from hairgs_tpu.render.renderer import RasterConfig, render

    is_hair = isinstance(model, HairModel)
    cfg = config if config is not None else RasterConfig()
    cams = cameras if max_cameras is None else cameras[:max_cameras]

    @jax.jit
    def metrics_one(params, camera, *model_extras):
        if is_hair:
            graph, = model_extras
            inputs = hair_render_inputs(params, graph, camera.cam_center,
                                        model.active_sh_degree,
                                        model.dist_to_scale_factor)
            active = graph.seg_active
        else:
            inputs = gaussian_render_inputs(params, camera.cam_center,
                                            model.active_sh_degree)
            active = model.active
        out = render(camera, **inputs, active=active, width=camera.width,
                     height=camera.height, config=cfg)
        img = jnp.clip(out["render"][..., :3], 0.0, 1.0)
        result = {
            "psnr": psnr(img, camera.image),
            "ssim": ssim(img, camera.image),
        }
        if camera.mask is not None:
            result["masked_psnr"] = masked_psnr(img, camera.image, camera.mask)
        return result

    extras = (model.graph,) if is_hair else ()
    sums: Dict[str, float] = {}
    n = 0
    for cam in cams:
        if cam.image is None:
            continue
        vals = metrics_one(model.params, cam, *extras)
        for k, v in vals.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / n for k, v in sums.items()} if n else {}
