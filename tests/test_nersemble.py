"""End-to-end fixture test for scripts/parse_nersemble.py.

Synthesizes a raw NeRSemble-layout capture (camera_params.json, images-2x,
alpha maps, facer segmentation masks, tracked FLAME params, FLAME model
pickles) and drives the parser into a trainable COLMAP scene, checking the
reference mask semantics (facer hair ∩ alpha with 13x13 dilation,
reference scripts/parse_nersemble.py:227-238) and alpha background removal
(ref l.263-265).
"""

import json
import os
import pickle
import runpy
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "parse_nersemble.py")
CAM_NAMES = ["222200042", "222200044", "222200046"]
W, H = 64, 48  # images-2x resolution of the fake capture


def _write_flame_assets(root):
    """FLAME pickle in the raw chumpy-free layout load_flame_model reads."""
    rng = np.random.default_rng(0)
    v, j, n_shape = 30, 5, 310  # shapedirs hold 300 shape + 10 expression
    jr = np.abs(rng.normal(size=(j, v)))
    jr /= jr.sum(axis=1, keepdims=True)
    w = np.abs(rng.normal(size=(v, j)))
    w /= w.sum(axis=1, keepdims=True)
    model = {
        "v_template": rng.normal(size=(v, 3)) * 0.1,
        "shapedirs": rng.normal(size=(v, 3, n_shape)) * 0.01,
        "posedirs": rng.normal(size=(v, 3, 9 * (j - 1))) * 0.01,
        "J_regressor": jr,
        "weights": w,
        "kintree_table": np.stack([np.array([0, 0, 1, 1, 3]), np.arange(j)]),
        "f": np.array([[0, 1, 2], [2, 3, 4]]),
    }
    model_path = os.path.join(root, "flame2023.pkl")
    with open(model_path, "wb") as f:
        pickle.dump(model, f)
    mask_path = os.path.join(root, "FLAME_masks.pkl")
    with open(mask_path, "wb") as f:
        pickle.dump({"scalp": np.array([1, 4, 7, 9])}, f)
    # static landmark embedding (faces index into model["f"]'s 2 faces)
    lmk_path = os.path.join(root, "flame_static_embedding.pkl")
    with open(lmk_path, "wb") as f:
        pickle.dump({
            "lmk_face_idx": rng.integers(0, 2, size=51),
            "lmk_b_coords": rng.dirichlet(np.ones(3), size=51),
        }, f)
    return model_path, mask_path, lmk_path


def _write_capture(root, pid="017"):
    part = os.path.join(root, pid)
    frame = os.path.join(part, "sequences", "EXP-1-head", "timesteps",
                         "frame_00000")
    rng = np.random.default_rng(1)

    # calibration: shared 2x-resolution intrinsics + per-cam world_2_cam
    K = np.array([[2 * 100.0, 0, 2 * (W / 2)],
                  [0, 2 * 100.0, 2 * (H / 2)],
                  [0, 0, 1.0]])
    w2c = {}
    for i, name in enumerate(CAM_NAMES):
        E = np.eye(4)
        E[:3, 3] = [0.02 * i, 0.0, 0.8]
        w2c[name] = E.tolist()
    os.makedirs(os.path.join(part, "calibration"))
    with open(os.path.join(part, "calibration", "camera_params.json"), "w") as f:
        json.dump({"intrinsics": K.tolist(), "world_2_cam": w2c}, f)

    # frame data: images-2x jpgs, alpha maps, facer segmentations
    for sub in ("images-2x", "alpha_map", "facer_segmentation_masks"):
        os.makedirs(os.path.join(frame, sub))
    seg = np.zeros((H, W), np.uint8)
    seg[5:20, 10:40] = 14          # hair class
    seg[25:40, 10:40] = 6          # some face class (excluded from mask)
    alpha = np.zeros((H, W), np.uint8)
    alpha[2:44, 4:60] = 255
    for name in CAM_NAMES:
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(frame, "images-2x", f"cam_{name}.jpg"), img)
        cv2.imwrite(os.path.join(frame, "alpha_map", f"cam_{name}.png"), alpha)
        cv2.imwrite(
            os.path.join(frame, "facer_segmentation_masks",
                         f"segmentation_cam_{name}.png"), seg)

    # tracked FLAME fit
    track = os.path.join(part, "sequences", "EXP-1-head", "annotations",
                         "tracking", "FLAME2023_v2")
    os.makedirs(track)
    np.savez(
        os.path.join(track, "tracked_flame_params.npz"),
        shape=rng.normal(size=(1, 300)) * 0.1,
        expression=rng.normal(size=(1, 10)) * 0.1,
        neck=rng.normal(size=(1, 3)) * 0.05,
        eyes=rng.normal(size=(1, 6)) * 0.05,
        rotation=rng.normal(size=(1, 3)) * 0.1,
        translation=rng.normal(size=(1, 3)) * 0.05,
        scale=np.array([[1.1]]),
    )
    return seg, alpha


@pytest.fixture(scope="module")
def parsed(tmp_path_factory):
    raw = tmp_path_factory.mktemp("raw")
    out = tmp_path_factory.mktemp("parsed")
    model_path, mask_path, lmk_path = _write_flame_assets(str(raw))
    seg, alpha = _write_capture(str(raw))
    argv = sys.argv
    sys.argv = ["parse_nersemble.py", "-r", str(raw), "-o", str(out),
                "-i", "17", "--flame_model_path", model_path,
                "--flame_mask_path", mask_path, "--num_angles", "12",
                "--static_landmark_embedding_path", lmk_path]
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = argv
    return os.path.join(str(out), "017"), seg, alpha


class TestParseNersemble:
    def test_outputs_exist(self, parsed):
        out, _, _ = parsed
        for cam_id in (222200042, 222200044, 222200046):
            assert os.path.exists(os.path.join(out, "images", f"image_{cam_id}.png"))
            assert os.path.exists(os.path.join(out, "masks", f"image_{cam_id}.png"))
            for suffix in ("orientation", "confidence"):
                assert os.path.exists(os.path.join(
                    out, "orientations", f"image_{cam_id}_{suffix}.png"))
        assert os.path.exists(os.path.join(out, "head_reconstruction_data.npz"))
        assert os.path.exists(os.path.join(out, "head_mesh.ply"))

    def test_mask_is_dilated_hair_intersect_alpha(self, parsed):
        out, seg, alpha = parsed
        got = cv2.imread(os.path.join(out, "masks", "image_222200042.png"),
                         cv2.IMREAD_GRAYSCALE)
        hair = seg == 14
        keep = (seg == 0) | hair
        dilated = cv2.dilate(hair.astype(np.uint8), np.ones((13, 13))).astype(bool)
        want = ((alpha > 0) & keep & dilated).astype(np.uint8) * 255
        np.testing.assert_array_equal(got, want)
        # face-class pixels never enter the mask even where alpha is on
        assert not got[30, 20]
        # hair pixels inside alpha do
        assert got[10, 20]

    def test_background_removed_by_alpha(self, parsed):
        out, _, alpha = parsed
        img = cv2.imread(os.path.join(out, "images", "image_222200042.png"))
        assert (img[alpha == 0] == 0).all()
        assert img[alpha > 0].any()

    def test_scene_is_trainable(self, parsed):
        out, _, _ = parsed
        from hairgs_tpu.io.dataset import load_camera, read_colmap_scene_info
        from hairgs_tpu.io.npz import load_head_reconstruction_data_npz

        info = read_colmap_scene_info(out)
        assert len(info.cameras) == 3
        cam = load_camera(info.cameras[0])
        assert cam.image.shape[-2:] == (48, 64) or cam.image.shape[:2] == (48, 64)
        assert cam.mask is not None and cam.orientation is not None
        head = load_head_reconstruction_data_npz(
            os.path.join(out, "head_reconstruction_data.npz"))
        assert head.scalp_verts.shape == (4, 3)
        assert np.isfinite(info.points).all()
        assert info.points.shape == (30, 3)

    def test_head_mesh_ply_has_faces(self, parsed):
        out, _, _ = parsed
        with open(os.path.join(out, "head_mesh.ply"), "rb") as f:
            header = f.read(400).decode("ascii", "ignore")
        assert "element vertex 30" in header
        assert "element face 2" in header
        assert "property list uchar int vertex_indices" in header
