"""Tests for auxiliary subsystems: FLAME, head meshes, network GUI protocol,
visualization, full-state checkpoints."""

import json
import socket
import threading

import numpy as np
import pytest

from hairgs_tpu.data.flame import FlameModel, flame_forward, _rodrigues
from hairgs_tpu.data.head import (
    estimate_vertex_normals,
    load_head_from_usc_dataset,
    load_obj,
)
from hairgs_tpu.network_gui import NetworkGUI
from hairgs_tpu.visualization import (
    create_subplots_from_dict,
    orientation_map_to_hsv,
    save_ply_edges,
)
from hairgs_tpu.io.ply import read_ply


def tiny_flame(v=20, j=5, n_shape=10):
    rng = np.random.default_rng(0)
    parents = np.array([0, 0, 1, 1, 3])
    jr = np.abs(rng.normal(size=(j, v)))
    jr /= jr.sum(axis=1, keepdims=True)
    w = np.abs(rng.normal(size=(v, j)))
    w /= w.sum(axis=1, keepdims=True)
    return FlameModel(
        v_template=rng.normal(size=(v, 3)),
        shapedirs=rng.normal(size=(v, 3, n_shape)) * 0.01,
        posedirs=rng.normal(size=(9 * (j - 1), v * 3)) * 0.01,
        j_regressor=jr,
        lbs_weights=w,
        parents=parents,
        faces=np.array([[0, 1, 2]]),
    )


class TestFlame:
    def test_rodrigues_identity(self):
        R = _rodrigues(np.zeros((3, 3)))
        for r in R:
            np.testing.assert_allclose(r, np.eye(3), atol=1e-9)

    def test_rodrigues_z90(self):
        R = _rodrigues(np.array([[0, 0, np.pi / 2]]))[0]
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-9)

    def test_rest_pose_is_template(self):
        m = tiny_flame()
        v = flame_forward(m)
        np.testing.assert_allclose(v, m.v_template, atol=1e-5)

    def test_global_rotation_rotates_all(self):
        m = tiny_flame()
        pose = np.zeros(6)
        pose[2] = np.pi / 2  # global z rotation
        v = flame_forward(m, pose_params=pose)
        # rigid: pairwise distances preserved
        d0 = np.linalg.norm(m.v_template[0] - m.v_template[1])
        d1 = np.linalg.norm(v[0] - v[1])
        np.testing.assert_allclose(d0, d1, rtol=1e-4)

    def test_shape_blendshape(self):
        m = tiny_flame()
        beta = np.zeros(10)
        beta[0] = 2.0
        v = flame_forward(m, shape_params=beta)
        expected = m.v_template + m.shapedirs[:, :, 0] * 2.0
        np.testing.assert_allclose(v, expected, atol=1e-5)

    def test_translation(self):
        m = tiny_flame()
        v = flame_forward(m, transl=np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(v - m.v_template, [[1, 2, 3]] * 20, atol=1e-5)


def tiny_flame_faces(v=20, j=5):
    """tiny_flame with enough faces for landmark embeddings to index."""
    m = tiny_flame(v=v, j=j)
    rng = np.random.default_rng(3)
    faces = rng.integers(0, v, size=(8, 3))
    return m._replace(faces=faces.astype(np.int64))


class TestFlameLandmarks:
    """Parity target: reference scene/flame.py:144-304 (static + dynamic
    landmark embeddings, vertices2landmarks, yaw-indexed contour table)."""

    def _static_embedding(self, n_faces=8, n_lmk=5, seed=7):
        from hairgs_tpu.data.flame import FlameLandmarkEmbedding

        rng = np.random.default_rng(seed)
        bary = rng.dirichlet(np.ones(3), size=n_lmk)
        return FlameLandmarkEmbedding(
            static_faces=rng.integers(0, n_faces, size=n_lmk).astype(np.int64),
            static_bary=bary,
        )

    def test_barycentric_corner_is_vertex(self):
        from hairgs_tpu.data.flame import FlameLandmarkEmbedding, flame_landmarks

        m = tiny_flame_faces()
        emb = FlameLandmarkEmbedding(
            static_faces=np.array([0, 1], np.int64),
            static_bary=np.array([[1.0, 0, 0], [0, 0, 1.0]]),
        )
        lmk = flame_landmarks(m, emb, m.v_template)
        np.testing.assert_allclose(lmk[0], m.v_template[m.faces[0, 0]],
                                   atol=1e-6)
        np.testing.assert_allclose(lmk[1], m.v_template[m.faces[1, 2]],
                                   atol=1e-6)

    def test_barycentric_mixture(self):
        from hairgs_tpu.data.flame import flame_landmarks

        m = tiny_flame_faces()
        emb = self._static_embedding()
        lmk = flame_landmarks(m, emb, m.v_template)
        want = np.einsum(
            "lkc,lk->lc", m.v_template[m.faces[emb.static_faces]],
            emb.static_bary)
        np.testing.assert_allclose(lmk, want, atol=1e-6)

    def test_forward_returns_landmarks_and_translates_both(self):
        m = tiny_flame_faces()
        emb = self._static_embedding()
        t = np.array([0.5, -1.0, 2.0])
        v0, l0 = flame_forward(m, landmark_embedding=emb)
        v1, l1 = flame_forward(m, landmark_embedding=emb, transl=t)
        np.testing.assert_allclose(v1 - v0, np.broadcast_to(t, v0.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(l1 - l0, np.broadcast_to(t, l0.shape),
                                   atol=1e-5)
        assert l0.shape == (5, 3)

    def test_dynamic_contour_row_from_yaw(self):
        """smplx masking arithmetic: neutral -> row 0; +y global rotation of
        theta degrees -> negative signed yaw -> row 39 + theta; -y rotation
        -> row theta; both saturate at +/-39 (rows 78 / 39)."""
        from hairgs_tpu.data.flame import _dynamic_lmk_index

        m = tiny_flame_faces()
        j = len(m.parents)

        def pose_with_global_y(deg):
            full = np.zeros((j, 3))
            full[0, 1] = np.deg2rad(deg)
            return full

        assert _dynamic_lmk_index(np.zeros((j, 3)), m.parents) == 0
        assert _dynamic_lmk_index(pose_with_global_y(10), m.parents) == 49
        assert _dynamic_lmk_index(pose_with_global_y(-10), m.parents) == 10
        assert _dynamic_lmk_index(pose_with_global_y(80), m.parents) == 78
        assert _dynamic_lmk_index(pose_with_global_y(-80), m.parents) == 39

    def test_contour_concatenation_order(self):
        """Contour landmarks come FIRST, then static (reference forward's
        torch.cat order, scene/flame.py:286-297)."""
        from hairgs_tpu.data.flame import flame_landmarks

        m = tiny_flame_faces()
        emb = self._static_embedding()
        rng = np.random.default_rng(11)
        dyn_bary = rng.dirichlet(np.ones(3), size=(79, 4))
        emb = emb._replace(
            dynamic_faces=rng.integers(0, 8, size=(79, 4)).astype(np.int64),
            dynamic_bary=dyn_bary,
        )
        j = len(m.parents)
        lmk = flame_landmarks(m, emb, m.v_template,
                              full_pose=np.zeros((j, 3)),
                              use_face_contour=True)
        assert lmk.shape == (4 + 5, 3)
        static_only = flame_landmarks(m, emb, m.v_template)
        np.testing.assert_allclose(lmk[4:], static_only, atol=1e-6)

    def test_embedding_loaders_roundtrip(self, tmp_path):
        import pickle as pkl

        from hairgs_tpu.data.flame import (
            load_dynamic_landmark_embedding,
            load_static_landmark_embedding,
        )

        rng = np.random.default_rng(13)
        static = {
            "lmk_face_idx": rng.integers(0, 8, size=51),
            "lmk_b_coords": rng.dirichlet(np.ones(3), size=51),
        }
        sp = tmp_path / "flame_static_embedding.pkl"
        with open(sp, "wb") as f:
            pkl.dump(static, f)
        dyn = {
            "lmk_face_idx": [rng.integers(0, 8, size=17) for _ in range(79)],
            "lmk_b_coords": [rng.dirichlet(np.ones(3), size=17)
                             for _ in range(79)],
        }
        dp = tmp_path / "flame_dynamic_embedding.npy"
        np.save(dp, np.array(dyn, dtype=object), allow_pickle=True)

        emb = load_static_landmark_embedding(str(sp))
        assert emb.static_faces.shape == (51,)
        np.testing.assert_allclose(emb.static_bary.sum(axis=1), 1.0,
                                   atol=1e-9)
        emb = load_dynamic_landmark_embedding(str(dp), emb)
        assert emb.dynamic_faces.shape == (79, 17)
        assert emb.dynamic_bary.shape == (79, 17, 3)
        assert emb.static_faces.shape == (51,)  # merge preserved static


class TestHeadObj:
    def test_load_obj_and_normals(self, tmp_path):
        p = tmp_path / "head.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
            "f 1 2 3\nf 1 2 4\n"
        )
        verts, normals, faces = load_obj(str(p))
        assert verts.shape == (4, 3)
        assert faces.shape == (2, 3)
        n = estimate_vertex_normals(verts, faces)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-5)
        head = load_head_from_usc_dataset(str(p))
        assert head.verts.shape == (4, 3)

    def test_quad_triangulation(self, tmp_path):
        p = tmp_path / "q.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        _, _, faces = load_obj(str(p))
        assert faces.shape == (2, 3)


class TestNetworkGUI:
    def test_protocol_roundtrip(self):
        gui = NetworkGUI()
        gui.init("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]

        received = {}

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.settimeout(10)
            msg = {
                "resolution_x": 64, "resolution_y": 48, "train": True,
                "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
                "shs_python": False, "rot_scale_python": False,
                "keep_alive": True, "scaling_modifier": 1.0,
                "view_matrix": list(np.eye(4).flatten().astype(float)),
                "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
            }
            payload = json.dumps(msg).encode()
            s.sendall(len(payload).to_bytes(4, "little") + payload)
            # read image bytes + verify string
            img = b""
            want = 64 * 48 * 3
            while len(img) < want:
                img += s.recv(want - len(img))
            vlen = int.from_bytes(s.recv(4), "little")
            received["verify"] = s.recv(vlen).decode()
            received["img_len"] = len(img)
            s.close()

        th = threading.Thread(target=client, daemon=True)
        th.start()
        import time

        for _ in range(200):
            gui.try_connect()
            if gui.conn is not None:
                break
            time.sleep(0.02)
        assert gui.conn is not None
        gui.conn.settimeout(10)
        cam, do_training, *_ = gui.receive()
        assert cam.width == 64 and cam.height == 48
        assert do_training
        # identity view with flipped y/z columns -> diag(1,-1,-1,1)
        np.testing.assert_allclose(np.diag(cam.world_view), [1, -1, -1, 1])
        gui.send(bytes(64 * 48 * 3), "test-path")
        th.join(timeout=5)
        assert received["verify"] == "test-path"
        assert received["img_len"] == 64 * 48 * 3


class TestVisualization:
    def test_grid_compositor(self):
        imgs = {
            "a": np.full((32, 32, 3), 100, np.uint8),
            "b": np.full((16, 48), 200, np.uint8),
        }
        grid = create_subplots_from_dict(imgs, image_w=256, image_h=128)
        assert grid.shape == (128, 256, 3)
        assert grid.max() >= 100

    def test_orientation_hsv(self):
        theta = np.linspace(0, np.pi - 1e-3, 64).reshape(8, 8)
        rgb = orientation_map_to_hsv(theta)
        assert rgb.shape == (8, 8, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1

    def test_save_ply_edges(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        cols = np.full((5, 3), 128, np.uint8)
        edges = np.array([[0, 1], [1, 2]])
        p = str(tmp_path / "e.ply")
        save_ply_edges(pts, cols, edges, p)
        out = read_ply(p)
        assert [n for n, _ in out] == ["vertex", "edge"]


class TestCheckpoint:
    def test_full_state_roundtrip(self, tmp_path):
        from hairgs_tpu.config import OptimizationConfig
        from hairgs_tpu.models.gaussian import GaussianModel

        rng = np.random.default_rng(0)
        pts = rng.normal(0, 0.1, (20, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (20, 3)).astype(np.float32)
        m = GaussianModel(sh_degree=0, capacity_round=64)
        m.create_from_pcd(pts, cols)
        m.training_setup(OptimizationConfig())
        # give the moments some state
        import jax.numpy as jnp

        m.opt_state = m.opt_state._replace(
            mu=m.opt_state.mu._replace(xyz=m.opt_state.mu.xyz + 0.5),
            step=jnp.asarray(7, jnp.int32),
        )
        path = str(tmp_path / "ckpt.npz")
        m.save_checkpoint(path)
        m2 = GaussianModel(sh_degree=0, capacity_round=64)
        m2.load_checkpoint(path)
        assert m2.count == 20
        assert int(m2.opt_state.step) == 7
        np.testing.assert_allclose(
            np.asarray(m2.opt_state.mu.xyz)[:20], np.asarray(m.opt_state.mu.xyz)[:20]
        )
        np.testing.assert_allclose(
            np.asarray(m2.params.xyz)[:20], np.asarray(m.params.xyz)[:20]
        )
