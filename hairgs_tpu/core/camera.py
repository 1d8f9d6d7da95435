"""Camera model (pure JAX pytree).

Parity targets: reference scene/cameras.py:19-132 (Camera/MiniCam),
utils/graphics.py:31-77 (getWorld2View2, getProjectionMatrix, fov<->focal).

Conventions: matrices are stored in standard math convention and applied as
``M @ [p, 1]`` (the reference stores the *transpose* and right-multiplies;
the CUDA kernels then index that transposed layout so the effective math is
identical — see auxiliary.h:58-77).
"""

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


def fov2focal(fov, pixels):
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(R, t, translate=np.array([0.0, 0.0, 0.0]), scale=1.0):
    """World->view 4x4 from COLMAP-style (R, t).

    Matches reference getWorld2View2 (utils/graphics.py:38-49): R is the
    camera-to-world rotation (transposed inside), t the world-to-camera
    translation; optional recentering/rescaling of the camera center.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear, zfar, fovx, fovy):
    """OpenGL-style projection as in reference utils/graphics.py:51-71
    (z mapped to [0, zfar/(zfar-znear)] range, w = +z)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


class Camera(NamedTuple):
    """JIT-friendly camera. All array leaves; batch by stacking leading axis.

    image / mask / orientation are channels-last (H, W, C) / (H, W) —
    TPU-friendly layout (the reference uses CHW on GPU).
    """

    world_view: jnp.ndarray  # (4,4) world -> view
    full_proj: jnp.ndarray  # (4,4) proj @ world_view
    cam_center: jnp.ndarray  # (3,)
    tanfovx: jnp.ndarray  # ()
    tanfovy: jnp.ndarray  # ()
    image: Optional[jnp.ndarray] = None  # (H,W,3) in [0,1]
    mask: Optional[jnp.ndarray] = None  # (H,W) float {0,1}
    orientation: Optional[jnp.ndarray] = None  # (H,W) radians in [0,pi)
    confidence: Optional[jnp.ndarray] = None  # (H,W) in [0,1]

    @property
    def height(self) -> int:
        return int(self.image.shape[-3])

    @property
    def width(self) -> int:
        return int(self.image.shape[-2])


def make_camera(
    R,
    t,
    fovx,
    fovy,
    image=None,
    mask=None,
    orientation=None,
    confidence=None,
    znear=0.01,
    zfar=100.0,
    trans=np.array([0.0, 0.0, 0.0]),
    scale=1.0,
) -> Camera:
    """Build a Camera from COLMAP-style extrinsics (znear/zfar defaults match
    reference scene/cameras.py:87-88)."""
    w2v = world_to_view(R, t, trans, scale)
    proj = projection_matrix(znear, zfar, fovx, fovy)
    full = proj @ w2v
    cam_center = np.linalg.inv(w2v)[:3, 3]
    return Camera(
        world_view=jnp.asarray(w2v),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(cam_center.astype(np.float32)),
        tanfovx=jnp.asarray(math.tan(fovx * 0.5), dtype=jnp.float32),
        tanfovy=jnp.asarray(math.tan(fovy * 0.5), dtype=jnp.float32),
        image=None if image is None else jnp.asarray(image, dtype=jnp.float32),
        mask=None if mask is None else jnp.asarray(mask, dtype=jnp.float32),
        orientation=None if orientation is None else jnp.asarray(orientation, dtype=jnp.float32),
        confidence=None if confidence is None else jnp.asarray(confidence, dtype=jnp.float32),
    )


def stack_cameras(cams) -> Camera:
    """Stack a list of Cameras into a batched Camera pytree (leading axis B)."""
    def _stack(*xs):
        if any(x is None for x in xs):
            return None
        return jnp.stack(xs)

    return Camera(*[_stack(*fields) for fields in zip(*cams)])
