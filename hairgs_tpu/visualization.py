"""Visualization helpers.

Parity targets: utils/visualization.py (all-camera render dicts l.23-48,
tiled labeled grid compositor l.51-105, hair graph -> polyline data l.108-134,
orientation-map HSV l.251-269) and utils/general.py:127-197 (polyline /
triangle PLY writers for external viewers). The interactive pyvista(+Qt)
plotters of the reference are gated on pyvista being installed.
"""

import math
from typing import Dict, Optional

import numpy as np

from hairgs_tpu.io.ply import _structured, write_ply


def render_image_dict_from_cameras(model, cameras, max_cameras: int = 16) -> Dict[str, np.ndarray]:
    """Render every camera once into an id->uint8 image dict
    (utils/visualization.py:23-48)."""
    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.models.hair import HairModel, hair_render_inputs
    from hairgs_tpu.render.renderer import RasterConfig, render

    out = {}
    is_hair = isinstance(model, HairModel)
    cfg = RasterConfig()
    for i, cam in enumerate(cameras[:max_cameras]):
        if is_hair:
            inputs = hair_render_inputs(model.params, model.graph, cam.cam_center,
                                        model.active_sh_degree,
                                        model.dist_to_scale_factor)
            active = model.graph.seg_active
        else:
            inputs = gaussian_render_inputs(model.params, cam.cam_center,
                                            model.active_sh_degree)
            active = model.active
        img = render(cam, **inputs, active=active, width=cam.width,
                     height=cam.height, config=cfg)["render"]
        rgb = np.clip(np.asarray(img[..., :3]), 0, 1)
        out[f"{i}-render"] = (rgb * 255).astype(np.uint8)
        if cam.image is not None:
            out[f"{i}-gt"] = (np.clip(np.asarray(cam.image), 0, 1) * 255).astype(np.uint8)
    return out


def create_subplots_from_dict(images: Dict[str, np.ndarray], image_w: int = 1920,
                              image_h: int = 1080) -> np.ndarray:
    """Tile labeled images into one grid image (utils/visualization.py:51-105).
    Labels are drawn with a minimal 5x7 bitmap if cv2 is unavailable."""
    if not images:
        return np.zeros((image_h, image_w, 3), np.uint8)
    n = len(images)
    cols = math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    cell_w, cell_h = image_w // cols, image_h // rows
    canvas = np.zeros((image_h, image_w, 3), np.uint8)
    try:
        import cv2
    except ImportError:
        cv2 = None
    for idx, (name, img) in enumerate(images.items()):
        r, c = divmod(idx, cols)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        ih, iw = img.shape[:2]
        scale = min(cell_w / iw, cell_h / ih)
        tw, th = max(1, int(iw * scale)), max(1, int(ih * scale))
        if cv2 is not None:
            resized = cv2.resize(img, (tw, th))
        else:
            yi = (np.linspace(0, ih - 1, th)).astype(int)
            xi = (np.linspace(0, iw - 1, tw)).astype(int)
            resized = img[yi][:, xi]
        y0, x0 = r * cell_h, c * cell_w
        canvas[y0 : y0 + th, x0 : x0 + tw] = resized[..., :3]
        if cv2 is not None:
            cv2.putText(canvas, str(name), (x0 + 4, y0 + 16),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
    return canvas


def get_joints_and_segments_from_hair(model):
    """(points (E,3), lines (S,2)) for polyline plotting
    (utils/visualization.py:108-134)."""
    arrays = model.host_arrays()
    return arrays["endpoints"], arrays["endpoint_pairs"]


def orientation_map_to_hsv(theta: np.ndarray, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """theta [0,pi) -> HSV hue wheel RGB image (utils/visualization.py:251-269)."""
    try:
        import cv2

        h = (theta * 255 / np.pi).astype(np.uint8)
        hsv = np.stack([h, np.full_like(h, 255), np.full_like(h, 255)], axis=-1)
        rgb = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32) / 255.0
    except ImportError:
        import colorsys

        flat = (theta / np.pi).reshape(-1)
        rgb = np.stack([
            np.asarray([colorsys.hsv_to_rgb(x, 1, 1)[c] for x in flat]).reshape(theta.shape)
            for c in range(3)
        ], axis=-1).astype(np.float32)
    if mask is not None:
        rgb = rgb * mask[..., None]
    return rgb


def save_ply_edges(vertex_xyz: np.ndarray, vertex_color: np.ndarray,
                   edges: Optional[np.ndarray], file_path: str):
    """Polyline PLY for viewers (utils/general.py:127-155)."""
    elements = []
    cols = [(ax, vertex_xyz[:, i].astype(np.float32), "f4") for i, ax in enumerate("xyz")]
    cols += [
        (ch, vertex_color[:, i].astype(np.uint8), "u1")
        for i, ch in enumerate(("red", "green", "blue"))
    ]
    elements.append(("vertex", _structured(cols)))
    if edges is not None:
        elements.append((
            "edge",
            _structured([
                ("vertex1", edges[:, 0].astype(np.int32), "i4"),
                ("vertex2", edges[:, 1].astype(np.int32), "i4"),
            ]),
        ))
    write_ply(file_path, elements)


def save_ply_faces(vertex_xyz: np.ndarray, vertex_color: np.ndarray,
                   edges: np.ndarray, file_path: str):
    """Each segment (A,B) as a degenerate triangle (A, mid, B) so mesh
    viewers without polyline support can display strands
    (utils/general.py:158-197). Requires PLY list properties, so faces are
    written manually."""
    import os
    import struct

    num_points = vertex_xyz.shape[0]
    seg = vertex_xyz[edges]
    mid = (seg[:, 0] + seg[:, 1]) / 2
    mid_color = (vertex_color[edges[:, 0]] + vertex_color[edges[:, 1]]) / 2
    verts = np.concatenate([vertex_xyz, mid], axis=0).astype(np.float32)
    colors = np.concatenate([vertex_color, mid_color], axis=0).astype(np.uint8)
    mid_idx = np.arange(edges.shape[0]) + num_points
    faces = np.column_stack([edges[:, 0], mid_idx, edges[:, 1]]).astype(np.int32)

    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    header = [
        "ply", "format binary_little_endian 1.0",
        f"element vertex {verts.shape[0]}",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        f"element face {faces.shape[0]}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    with open(file_path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for v, c in zip(verts, colors):
            f.write(struct.pack("<fffBBB", v[0], v[1], v[2], c[0], c[1], c[2]))
        for face in faces:
            f.write(struct.pack("<Biii", 3, face[0], face[1], face[2]))


def create_pv_background_plotter(model, cameras):
    """Interactive 3D strand plotter (utils/visualization.py:137-248);
    requires pyvista + Qt, gated."""
    try:
        import pyvista as pv
        from pyvistaqt import BackgroundPlotter
    except ImportError as e:
        raise ImportError(
            "interactive 3D visualization requires pyvista + pyvistaqt"
        ) from e
    points, lines = get_joints_and_segments_from_hair(model)
    cells = np.column_stack([np.full(lines.shape[0], 2), lines]).ravel()
    polydata = pv.PolyData(points, lines=cells)
    plotter = BackgroundPlotter()
    plotter.add_mesh(polydata, render_lines_as_tubes=True, line_width=2)
    return plotter, polydata
