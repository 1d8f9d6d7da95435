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
