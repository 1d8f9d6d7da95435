"""Quaternion / rotation utilities (pure jnp).

Parity targets: reference utils/transform.py:7-86 (build_rotation,
build_scaling_rotation, calculate_rotation_from_vectors) and
utils/general.py:71-84 (strip_symmetric). Quaternions are wxyz.
"""

import jax.numpy as jnp


def build_rotation(q):
    """Batched unit-normalized quaternion (N,4 wxyz) -> rotation matrices (N,3,3).

    Matches reference utils/transform.py:7-30.
    """
    # +eps inside the sqrt keeps the gradient finite (zero) for zero quats
    # (padding rows of the arena); normal quats are unaffected
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s, q):
    """L = R @ diag(s); covariance = L @ L^T.  Reference utils/transform.py:33-42."""
    R = build_rotation(q)
    return R * s[..., None, :]


def strip_symmetric(cov):
    """(N,3,3) symmetric -> (N,6) upper triangle [xx,xy,xz,yy,yz,zz].

    Reference utils/general.py:71-84.
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def matrix_to_quaternion(R):
    """Batched rotation matrix (N,3,3) -> quaternion (N,4) wxyz.

    Branch-free variant of the standard Shepperd method: compute all four
    candidate quaternions and select by the largest pivot (jit-friendly,
    numerically stable for all rotations).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each scaled by 4*q_pivot
    qw0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx0 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # (..., 4cand, 4comp)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0 (pytorch3d standardize does this too)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def rotation_between_vectors(v1, v2, eps: float = 1e-7):
    """Rotation matrix that rotates each v1 onto each (normalized) v2.

    Rodrigues form R = I + K + K^2 / (1 + v1.v2) as in reference
    utils/transform.py:69-86 (calculate_rotation_from_vectors).
    v1 is expected to be unit length already (the reference passes (1,0,0)).
    """
    v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
    dot = jnp.sum(v1 * v2, axis=-1)
    dot = jnp.clip(dot, -1.0 + eps, 1.0 - eps)
    cross = jnp.cross(v1, v2)
    cx, cy, cz = cross[..., 0], cross[..., 1], cross[..., 2]
    zeros = jnp.zeros_like(cx)
    K = jnp.stack(
        [zeros, -cz, cy, cz, zeros, -cx, -cy, cx, zeros], axis=-1
    ).reshape(cross.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v2.dtype), K.shape)
    R = eye + K + (K @ K) / (1.0 + dot)[..., None, None]
    return R


def quaternion_between_vectors(v1, v2, eps: float = 1e-7):
    """Quaternion (wxyz) rotating v1 onto v2; reference uses this for the
    derived rotation of hair segments (scene/hair_gaussian_model.py:147-165)."""
    return matrix_to_quaternion(rotation_between_vectors(v1, v2, eps))
