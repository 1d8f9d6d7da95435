import os
import numpy as np
import pytest

from hairgs_tpu.io.ply import (
    read_ply,
    write_ply,
    save_gaussian_ply,
    load_gaussian_ply,
    save_hair_ply,
    load_hair_ply,
    store_point_ply,
    fetch_point_ply,
    count_ply_elements,
    _structured,
)
from hairgs_tpu.io.colmap import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    read_extrinsics_binary,
    read_intrinsics_binary,
    read_points3D_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3D_binary,
    qvec2rotmat,
    rotmat2qvec,
)
from hairgs_tpu.io.npz import (
    HairData,
    save_hair_eval_data_npz,
    load_hair_eval_data_npz,
    save_head_reconstruction_data_npz,
    load_head_reconstruction_data_npz,
)


class TestPlyPrimitive:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(0)
        arr = _structured([
            ("x", rng.normal(size=10).astype(np.float32), "f4"),
            ("idx", np.arange(10, dtype=np.int32), "i4"),
            ("c", rng.integers(0, 255, 10).astype(np.uint8), "u1"),
        ])
        p = str(tmp_path / "t.ply")
        write_ply(p, [("vertex", arr)])
        out = read_ply(p)
        assert out[0][0] == "vertex"
        for f in arr.dtype.names:
            np.testing.assert_array_equal(out[0][1][f], arr[f])

    def test_roundtrip_ascii(self, tmp_path):
        arr = _structured([
            ("x", np.asarray([1.5, -2.25], np.float32), "f4"),
            ("i", np.asarray([3, -7], np.int32), "i4"),
        ])
        p = str(tmp_path / "t.ply")
        write_ply(p, [("vertex", arr)], text=True)
        out = read_ply(p)
        np.testing.assert_array_equal(out[0][1]["x"], arr["x"])
        np.testing.assert_array_equal(out[0][1]["i"], arr["i"])

    def test_multi_element(self, tmp_path):
        a = _structured([("x", np.ones(3, np.float32), "f4")])
        b = _structured([("v", np.arange(5, dtype=np.int32), "i4")])
        p = str(tmp_path / "m.ply")
        write_ply(p, [("vertex", a), ("edge", b)])
        out = read_ply(p)
        assert [name for name, _ in out] == ["vertex", "edge"]
        assert count_ply_elements(p) == 2


class TestCheckpointFormats:
    def _gaussian_arrays(self, n=17, sh_degree=2):
        rng = np.random.default_rng(1)
        k = (sh_degree + 1) ** 2
        return dict(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
            features_rest=rng.normal(size=(n, k - 1, 3)).astype(np.float32),
            opacity=rng.normal(size=(n, 1)).astype(np.float32),
            mask=rng.normal(size=(n, 1)).astype(np.float32),
            scaling=rng.normal(size=(n, 3)).astype(np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
        )

    def test_gaussian_ply_roundtrip(self, tmp_path):
        arrays = self._gaussian_arrays()
        p = str(tmp_path / "g.ply")
        save_gaussian_ply(p, arrays)
        out = load_gaussian_ply(p, max_sh_degree=2)
        for k in arrays:
            np.testing.assert_allclose(out[k], arrays[k], atol=0, err_msg=k)

    def test_gaussian_ply_field_names(self, tmp_path):
        # exact reference attribute order (scene/gaussian_model.py:268-281)
        arrays = self._gaussian_arrays(sh_degree=1)
        p = str(tmp_path / "g.ply")
        save_gaussian_ply(p, arrays)
        fields = read_ply(p)[0][1].dtype.names
        expected = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(9)]
            + ["opacity", "mask"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert list(fields) == expected

    def test_hair_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        ne, ns = 12, 9
        arrays = dict(
            endpoints=rng.normal(size=(ne, 3)).astype(np.float32),
            endpoint_pairs=rng.integers(0, ne, (ns, 2)).astype(np.int32),
            features_dc=rng.normal(size=(ns, 1, 3)).astype(np.float32),
            features_rest=rng.normal(size=(ns, 0, 3)).astype(np.float32),
            opacity=rng.normal(size=(ns, 1)).astype(np.float32),
            mask=rng.normal(size=(ns, 1)).astype(np.float32),
            width=rng.normal(size=(ns, 1)).astype(np.float32),
        )
        root_idx = np.asarray([0, 5])
        ref_root = rng.normal(size=(4, 3)).astype(np.float32)
        p = str(tmp_path / "h.ply")
        save_hair_ply(p, arrays, root_idx, ref_root)
        assert count_ply_elements(p) == 5
        out, out_root, out_ref = load_hair_ply(p, max_sh_degree=0)
        for k in arrays:
            np.testing.assert_allclose(out[k], arrays[k], err_msg=k)
        np.testing.assert_array_equal(out_root, root_idx)
        np.testing.assert_allclose(out_ref, ref_root)

    def test_point_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        xyz = rng.normal(size=(7, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (7, 3)).astype(np.uint8)
        p = str(tmp_path / "p.ply")
        store_point_ply(p, xyz, rgb)
        pts, colors, normals = fetch_point_ply(p)
        np.testing.assert_allclose(pts, xyz)
        np.testing.assert_allclose(colors, rgb / 255.0, atol=1e-6)


class TestColmap:
    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-6)

    def test_binary_roundtrip(self, tmp_path):
        cams = {
            1: ColmapCamera(id=1, model="PINHOLE", width=640, height=480,
                            params=np.asarray([500.0, 510.0, 320.0, 240.0]))
        }
        imgs = {
            1: ColmapImage(id=1, qvec=np.asarray([1.0, 0, 0, 0]),
                           tvec=np.asarray([0.1, 0.2, 0.3]), camera_id=1,
                           name="image_1.png",
                           xys=np.asarray([[10.0, 20.0], [30.0, 40.0]]),
                           point3D_ids=np.asarray([1, 2])),
        }
        pts = {
            1: ColmapPoint3D(id=1, xyz=np.asarray([0.0, 1.0, 2.0]),
                             rgb=np.asarray([255, 0, 0]), error=0.0,
                             image_ids=np.asarray([1]), point2D_idxs=[1]),
            2: ColmapPoint3D(id=2, xyz=np.asarray([3.0, 4.0, 5.0]),
                             rgb=np.asarray([0, 255, 0]), error=0.5,
                             image_ids=np.asarray([1]), point2D_idxs=[2]),
        }
        write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
        write_images_binary(imgs, str(tmp_path / "images.bin"))
        write_points3D_binary(pts, str(tmp_path / "points3D.bin"))
        cams2 = read_intrinsics_binary(str(tmp_path / "cameras.bin"))
        imgs2 = read_extrinsics_binary(str(tmp_path / "images.bin"))
        xyz, rgb, err = read_points3D_binary(str(tmp_path / "points3D.bin"))
        assert cams2[1].model == "PINHOLE"
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        assert imgs2[1].name == "image_1.png"
        np.testing.assert_allclose(imgs2[1].qvec, imgs[1].qvec)
        np.testing.assert_allclose(imgs2[1].xys, imgs[1].xys)
        np.testing.assert_allclose(xyz[0], [0, 1, 2])
        np.testing.assert_allclose(rgb[1], [0, 255, 0])


class TestNpz:
    def test_hair_eval_roundtrip(self, tmp_path):
        # 2 strands x 4 verts
        verts = np.asarray(
            [[i, 0, 0] for i in range(4)] + [[i, 1, 0] for i in range(4)],
            dtype=np.float32,
        )
        edges = np.asarray(
            [[0, 1], [1, 2], [2, 3], [4, 5], [5, 6], [6, 7]], dtype=np.int64
        )
        hair = HairData(
            verts=verts, colors=np.ones((8, 4)), normals=None, edges=edges,
            strand_root_idx=np.asarray([0, 4]),
            verts_id_to_strand_id=np.repeat([0, 1], 4),
        )
        p = str(tmp_path / "hair_eval_data.npz")
        save_hair_eval_data_npz(p, hair)
        data = load_hair_eval_data_npz(p)
        assert data.points.shape == (6, 3)  # one eval point per edge
        np.testing.assert_allclose(np.linalg.norm(data.directions, axis=1), 1.0,
                                   rtol=1e-6)
        # last edge of each strand dropped: 2 strands x 2 edges
        assert data.edges.shape == (4, 2)
        np.testing.assert_array_equal(data.points_id_to_strand_id,
                                      np.repeat([0, 1], 3))

    def test_head_reconstruction_roundtrip(self, tmp_path):
        p = str(tmp_path / "head_reconstruction_data.npz")
        head = np.random.default_rng(0).normal(size=(10, 3))
        scalp = head[:4]
        save_head_reconstruction_data_npz(p, head, scalp)
        out = load_head_reconstruction_data_npz(p)
        np.testing.assert_allclose(out.head_verts, head)
        np.testing.assert_allclose(out.scalp_verts, scalp)
