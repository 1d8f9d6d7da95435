#!/usr/bin/env python
"""NeRSemble real multi-view capture preparation.

Parity target: reference scripts/parse_nersemble.py:150-367 — per sequence:
copy/downscale the real images, build hair masks (the reference intersects a
facer hair segmentation with the capture alpha masks), estimate orientation
maps with the Gabor bank, evaluate the fitted FLAME for the scalp vertices
(head_reconstruction_data.npz) and the init point cloud, and write the COLMAP
scene from the provided camera calibration.

External inputs this script expects on disk (the reference obtains them from
the NeRSemble release + a facer segmentation pass, neither of which is
redistributable):
  <capture>/images/*.png           undistorted images (one per camera)
  <capture>/masks/*.png            binary hair masks
  <capture>/cameras.json           {name: {K: 3x3, E: 4x4 world->cam}, ...}
  <capture>/flame/generic_model.pkl, flame_params.npz, FLAME_masks.pkl
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--capture_path", "-c", required=True)
    parser.add_argument("--output_path", "-o", required=True)
    parser.add_argument("--downscale", type=int, default=2)
    parser.add_argument("--num_angles", type=int, default=180)
    args = parser.parse_args()

    from PIL import Image as PILImage

    from hairgs_tpu.data.flame import flame_forward, load_flame_masks, load_flame_model
    from hairgs_tpu.data.vision import estimate_orientation_field
    from hairgs_tpu.io.colmap import (
        ColmapCamera,
        ColmapImage,
        generate_colmap_data,
        rotmat2qvec,
        write_cameras_binary,
        write_images_binary,
        write_points3D_binary,
    )
    from hairgs_tpu.io.npz import save_head_reconstruction_data_npz

    cap = args.capture_path
    out = args.output_path
    for sub in ("images", "masks", "orientations"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    with open(os.path.join(cap, "cameras.json")) as f:
        calib = json.load(f)

    cameras, extrinsics = {}, {}
    cam_id = 1
    for name, entry in sorted(calib.items()):
        img_path = os.path.join(cap, "images", f"{name}.png")
        mask_path = os.path.join(cap, "masks", f"{name}.png")
        if not os.path.exists(img_path):
            print(f"skip {name}: no image")
            continue
        img = PILImage.open(img_path)
        w, h = img.size[0] // args.downscale, img.size[1] // args.downscale
        img = img.convert("RGB").resize((w, h))
        img.save(os.path.join(out, "images", f"image_{cam_id}.png"))
        K = np.asarray(entry["K"], dtype=np.float64) / args.downscale
        K[2, 2] = 1.0
        E = np.asarray(entry["E"], dtype=np.float64)
        cameras[cam_id] = ColmapCamera(
            id=cam_id, model="PINHOLE", width=w, height=h,
            params=np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
        )
        extrinsics[cam_id] = E
        # hair mask (already intersected with alpha by the producer)
        if os.path.exists(mask_path):
            m = PILImage.open(mask_path).convert("L").resize((w, h), PILImage.NEAREST)
            m.save(os.path.join(out, "masks", f"image_{cam_id}.png"))
        # Gabor orientation estimation on the real image
        theta, conf = estimate_orientation_field(
            np.asarray(img), num_angles=args.num_angles
        )
        PILImage.fromarray((theta * 255 / np.pi).astype(np.uint8)).save(
            os.path.join(out, "orientations", f"image_{cam_id}_orientation.png")
        )
        PILImage.fromarray((conf * 255).astype(np.uint8)).save(
            os.path.join(out, "orientations", f"image_{cam_id}_confidence.png")
        )
        cam_id += 1

    # fitted FLAME -> head verts, scalp verts, init point cloud
    flame_dir = os.path.join(cap, "flame")
    model = load_flame_model(os.path.join(flame_dir, "generic_model.pkl"))
    params = np.load(os.path.join(flame_dir, "flame_params.npz"))
    verts = flame_forward(
        model,
        shape_params=params.get("shape"),
        expression_params=params.get("expression"),
        pose_params=params.get("pose"),
        neck_pose=params.get("neck_pose"),
        eye_pose=params.get("eye_pose"),
        transl=params.get("transl"),
    )
    if "scale" in params:
        verts = verts * float(params["scale"])
    masks = load_flame_masks(os.path.join(flame_dir, "FLAME_masks.pkl"))
    scalp = verts[masks["scalp"]]
    save_head_reconstruction_data_npz(
        os.path.join(out, "head_reconstruction_data.npz"), verts, scalp
    )

    colors = np.full((verts.shape[0], 3), 0.5, dtype=np.float32)
    images, points3d = generate_colmap_data(cameras, extrinsics, verts, colors)
    sparse = os.path.join(out, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    write_cameras_binary(cameras, os.path.join(sparse, "cameras.bin"))
    write_images_binary(images, os.path.join(sparse, "images.bin"))
    write_points3D_binary(points3d, os.path.join(sparse, "points3D.bin"))
    print(f"NeRSemble scene written to {out} ({len(cameras)} cameras, "
          f"{verts.shape[0]} FLAME verts, {scalp.shape[0]} scalp verts)")


if __name__ == "__main__":
    main()
