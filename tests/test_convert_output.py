"""scripts/convert_output.py end-to-end: checkpoint PLY -> viewer PLYs.

Reference scripts/convert_output.py:18-77 — type dispatch via the loader
registry, per-strand HSV hue colors, edges/faces output modes.
"""

import os
import runpy
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "convert_output.py")


@pytest.fixture(scope="module")
def hair_ply(tmp_path_factory):
    import __graft_entry__ as ge

    model, _, _, _, _ = ge._tiny_hair_setup()
    path = str(tmp_path_factory.mktemp("ckpt") / "point_cloud.ply")
    model.save_ply(path)
    return path


def _run(argv):
    old = sys.argv
    sys.argv = ["convert_output.py"] + argv
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = old


class TestConvertOutput:
    def test_edges_mode(self, hair_ply, tmp_path):
        out = str(tmp_path / "strands_edges.ply")
        _run(["-i", hair_ply, "-t", "gs", "--edges", "-o", out])
        with open(out, "rb") as f:
            header = f.read(400).decode("ascii", "ignore")
        assert "element vertex" in header and "edge" in header

    def test_faces_mode_default_output(self, hair_ply):
        _run(["-i", hair_ply, "-t", "gs"])
        out = os.path.join(os.path.dirname(hair_ply), "strands.ply")
        assert os.path.exists(out)
        with open(out, "rb") as f:
            header = f.read(400).decode("ascii", "ignore")
        assert "face" in header

    def test_unknown_type_raises(self, hair_ply):
        with pytest.raises(ValueError, match="not supported"):
            _run(["-i", hair_ply, "-t", "bogus"])

    def test_strand_hue_colors_distinct(self):
        sys.path.insert(0, os.path.dirname(SCRIPT))
        from convert_output import strand_hue_colors

        sid = np.array([0, 0, 1, 1, 2, 2])
        c = strand_hue_colors(sid)
        assert c.shape == (6, 3) and c.dtype == np.uint8
        assert not np.array_equal(c[0], c[2])
        assert np.array_equal(c[0], c[1])
