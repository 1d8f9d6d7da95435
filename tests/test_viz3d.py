"""Interactive 3D visualization parity (utils/visualization.py:137-248,
reference merge.py:118-158), exercised against a recording fake pyvista —
the real library is optional and absent in CI, so the tests validate the
data massaging, key-event registration, and viewpoint math instead of
pixels."""

import math

import numpy as np

from hairgs_tpu.core.camera import make_camera
from hairgs_tpu.visualization import (
    camera_frustum_lines,
    create_pv_background_plotter,
    make_merge_viz_callback,
    make_viewpoint_setter,
    pv_visualize,
    update_polydata_from_hair,
)

from tests.test_topo import make_hair_model, two_strands


class FakeCamera:
    def __init__(self):
        self.calls = {}

    def __getattr__(self, name):
        if not name.startswith("Set"):
            raise AttributeError(name)

        def record(*args):
            self.calls[name] = args

        return record


class FakePolyData:
    def __init__(self, points=None, lines=None):
        self.points = points
        self.lines = lines


class FakePlotter:
    def __init__(self, *a, **k):
        self.points = []
        self.lines = []
        self.meshes = []
        self.texts = []
        self.key_events = {}
        self.camera = FakeCamera()
        self.shown = False
        self.rendered = False
        self.closed = False
        self.background = None

    def add_points(self, pts, **k):
        self.points.append((np.asarray(pts), k))

    def add_lines(self, lines, **k):
        self.lines.append((np.asarray(lines), k))

    def add_mesh(self, mesh, **k):
        self.meshes.append((mesh, k))

    def add_axes(self, *a, **k):
        return self

    def add_text(self, text, **k):
        self.texts.append(text)

    def add_title(self, text, **k):
        self.texts.append(text)

    def add_key_event(self, key, cb):
        self.key_events[key] = cb

    def set_background(self, c):
        self.background = c

    def view_isometric(self):
        pass

    def render(self):
        self.rendered = True

    def show(self):
        self.shown = True

    def close(self):
        self.closed = True


class FakePV:
    Plotter = FakePlotter
    PolyData = FakePolyData


def ring_camera(angle, dist=0.3):
    R = np.array([
        [np.cos(angle), 0, np.sin(angle)],
        [0, 1, 0],
        [-np.sin(angle), 0, np.cos(angle)],
    ])
    return make_camera(R, np.array([0.0, 0.0, dist]), fovx=0.9, fovy=0.8)


class TestPvVisualize:
    def test_standalone_shows(self):
        pv = FakePV()
        pts = np.random.default_rng(0).normal(0, 1, (10, 3)).astype(np.float32)
        plotter = pv_visualize(point_clouds={"blue": pts}, title="t", pv=pv)
        assert plotter.shown and plotter.rendered
        got, kwargs = plotter.points[0]
        np.testing.assert_array_equal(got, pts)
        assert kwargs["color"] == "blue"
        # no lines given: full-opacity size-1 points (reference l.151-152)
        assert kwargs["point_size"] == 1 and kwargs["opacity"] == 1

    def test_subplot_adds_text_not_show(self):
        pv = FakePV()
        p = FakePlotter()
        lines = np.zeros((4, 3), np.float32)
        pv_visualize(plotter=p, lines={"white": lines}, title="step", pv=pv)
        assert p.texts == ["step"] and not p.shown
        assert p.lines[0][1]["color"] == "white"


class TestViewpoints:
    def test_frustum_lines_anchor_at_camera_center(self):
        cam = ring_camera(0.7)
        segs = camera_frustum_lines(cam, scale=0.1)
        assert segs.shape == (16, 3)
        c2w = np.linalg.inv(np.asarray(cam.world_view))
        # rays 0,2,4,6 start at the camera center
        for i in range(0, 8, 2):
            np.testing.assert_allclose(segs[2 * i], c2w[:3, 3], atol=1e-5)

    def test_viewpoint_setter_matches_camera_pose(self):
        cam = ring_camera(1.1)
        p = FakePlotter()
        make_viewpoint_setter(p, cam)()
        c2w = np.linalg.inv(np.asarray(cam.world_view))
        np.testing.assert_allclose(p.camera.calls["SetPosition"][0],
                                   c2w[:3, 3], atol=1e-6)
        view_dir = c2w[:3, :3] @ np.array([0, 0, 1.0])
        np.testing.assert_allclose(p.camera.calls["SetFocalPoint"][0],
                                   c2w[:3, 3] + view_dir, atol=1e-6)
        fov_deg = p.camera.calls["SetViewAngle"][0]
        assert abs(fov_deg - 180 * 2 * math.atan(math.tan(0.45)) / math.pi) < 1e-6


class TestBackgroundPlotter:
    def test_keys_frustums_and_mesh(self):
        eps, pairs = two_strands()
        model = make_hair_model(eps, pairs)
        cams = [ring_camera(0.0), ring_camera(1.0), ring_camera(2.0)]
        pv = FakePV()
        plotter, polydata = create_pv_background_plotter(model, cams, pv=pv)
        assert isinstance(polydata, FakePolyData)
        assert polydata.points.shape == (6, 3)
        assert set(plotter.key_events) == {"1", "2", "3"}
        assert len(plotter.lines) == 3  # one frustum per camera
        # key 2 moves the view to camera 2
        plotter.key_events["2"]()
        c2w = np.linalg.inv(np.asarray(cams[1].world_view))
        np.testing.assert_allclose(plotter.camera.calls["SetPosition"][0],
                                   c2w[:3, 3], atol=1e-6)

    def test_update_polydata_tracks_model(self):
        eps, pairs = two_strands()
        model = make_hair_model(eps, pairs)
        pd = FakePolyData()
        update_polydata_from_hair(pd, model)
        assert pd.points.shape == (6, 3)
        assert pd.lines.shape == (3 * len(pairs),)


class TestMergeViz:
    def test_candidate_lines_drawn_pre_merge(self):
        eps, pairs = two_strands()
        model = make_hair_model(eps, pairs)
        pv = FakePV()
        made = []
        orig_plotter = FakePV.Plotter

        class RecordingPV(FakePV):
            class Plotter(FakePlotter):
                def __init__(self, *a, **k):
                    super().__init__(*a, **k)
                    made.append(self)

        viz = make_merge_viz_callback(model, pv=RecordingPV())
        cand = np.asarray([[2, 3]])
        viz(1, cand)
        p = made[0]
        assert p.shown and p.background == "black"
        white = [l for l, k in p.lines if k.get("color") == "white"]
        assert white and white[0].shape == (2, 3)
        np.testing.assert_allclose(white[0][0], eps[2], atol=1e-6)
        np.testing.assert_allclose(white[0][1], eps[3], atol=1e-6)
        del orig_plotter
