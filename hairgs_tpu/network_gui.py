"""Live-viewer network GUI (SIBR remote-viewer protocol).

Parity target: gaussian_renderer/network_gui.py — non-blocking TCP server
speaking the SIBR viewer protocol: length-prefixed JSON messages in
(resolution, fov, near/far, view / view-projection matrices with flipped y/z
columns, training toggle, python-eval toggles, scaling modifier), raw RGB
bytes + a length-prefixed verify string out.

The incoming matrices are in the reference's transposed right-multiply
convention; they are converted to this framework's math convention
(M @ [p,1]) on receipt.
"""

import json
import socket
import traceback
from typing import NamedTuple, Optional

import numpy as np


class MiniCam(NamedTuple):
    """Viewer-supplied camera (scene/cameras.py:111-132 equivalent)."""

    width: int
    height: int
    fovy: float
    fovx: float
    znear: float
    zfar: float
    world_view: np.ndarray  # (4,4) math convention
    full_proj: np.ndarray  # (4,4)
    cam_center: np.ndarray  # (3,)

    def to_camera(self):
        import jax.numpy as jnp
        import math

        from hairgs_tpu.core.camera import Camera

        return Camera(
            world_view=jnp.asarray(self.world_view, dtype=jnp.float32),
            full_proj=jnp.asarray(self.full_proj, dtype=jnp.float32),
            cam_center=jnp.asarray(self.cam_center, dtype=jnp.float32),
            tanfovx=jnp.asarray(math.tan(self.fovx * 0.5), dtype=jnp.float32),
            tanfovy=jnp.asarray(math.tan(self.fovy * 0.5), dtype=jnp.float32),
        )


class NetworkGUI:
    def __init__(self):
        self.host = "127.0.0.1"
        self.port = 6009
        self.conn: Optional[socket.socket] = None
        self.addr = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)

    def init(self, host: str, port: int):
        self.host, self.port = host, port
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self):
        try:
            self.conn, self.addr = self.listener.accept()
            print(f"\nConnected by {self.addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, OSError):
            pass

    def _read(self):
        length = int.from_bytes(self.conn.recv(4), "little")
        payload = b""
        while len(payload) < length:
            chunk = self.conn.recv(length - len(payload))
            if not chunk:
                raise ConnectionError("viewer closed connection")
            payload += chunk
        return json.loads(payload.decode("utf-8"))

    def send(self, image_bytes: Optional[bytes], verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """Returns (MiniCam|None, do_training, shs_python, rot_scale_python,
        keep_alive, scaling_modifier)."""
        message = self._read()
        width = message["resolution_x"]
        height = message["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None, None, None
        try:
            do_training = bool(message["train"])
            fovy = message["fov_y"]
            fovx = message["fov_x"]
            znear = message["z_near"]
            zfar = message["z_far"]
            shs_python = bool(message["shs_python"])
            rot_scale_python = bool(message["rot_scale_python"])
            keep_alive = bool(message["keep_alive"])
            scaling_modifier = message["scaling_modifier"]
            # viewer sends transposed matrices with flipped y/z columns
            wv_t = np.asarray(message["view_matrix"], dtype=np.float32).reshape(4, 4)
            wv_t[:, 1] *= -1
            wv_t[:, 2] *= -1
            fp_t = np.asarray(
                message["view_projection_matrix"], dtype=np.float32
            ).reshape(4, 4)
            fp_t[:, 1] *= -1
            fp_t[:, 2] *= -1
            world_view = wv_t.T  # to math convention
            full_proj = fp_t.T
            cam_center = np.linalg.inv(world_view)[:3, 3]
            cam = MiniCam(width, height, fovy, fovx, znear, zfar,
                          world_view, full_proj, cam_center)
        except Exception as e:
            print("")
            traceback.print_exc()
            raise e
        return (cam, do_training, shs_python, rot_scale_python, keep_alive,
                scaling_modifier)


network_gui = NetworkGUI()
