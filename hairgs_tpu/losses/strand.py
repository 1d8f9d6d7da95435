"""Strand-specific regularizers (fixed-shape, jit-friendly).

Parity targets: loss/losses.py:175-221 (angle_smoothness_loss) and
loss/losses.py:106-172 (strand_joints_magnet_loss, disabled by default —
lambda_magnet = 0, arguments/__init__.py:93).

The reference extracts consecutive-segment index pairs on the host via the
Cython helper c_utils.filter_strand_list_segments (c_utils.pyx:83-127); here
the host topology code produces the same padded (M,2,2) index array after
every topology change (it is constant between changes), and the loss itself
runs on device inside the jitted step.
"""

import math

import jax
import jax.numpy as jnp

from hairgs_tpu.core.maths import MIN_VAL, safe_norm


def angle_smoothness_loss(endpoints, pair_indices, pair_valid, threshold_deg: float = 30.0,
                          eps: float = 1e-6):
    """Mean squared angle (rad) between consecutive segments that bend more
    than `threshold_deg`.

    endpoints: (E,3); pair_indices: (M,2,2) int — [[a,b],[b,c]] endpoint ids of
    consecutive segments; pair_valid: (M,) bool.
    """
    angle_sim_th = math.cos(math.radians(threshold_deg))
    pos = endpoints[pair_indices]  # (M,2,2,3)
    dirs = pos[:, :, 1] - pos[:, :, 0]  # (M,2,3)
    norm = safe_norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / jnp.maximum(norm, MIN_VAL)
    dots = jnp.sum(dirs[:, 0] * dirs[:, 1], axis=-1)  # (M,)
    sel = pair_valid & (dots <= angle_sim_th)
    dots = jnp.clip(dots, -1 + eps, 1 - eps)
    angles = jnp.arccos(dots)
    count = jnp.sum(sel)
    total = jnp.sum(jnp.where(sel, angles * angles, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def strand_joints_magnet_loss(endpoints, strand_endpoint_ids, complementary_ids,
                              valid):
    """Attract free strand endpoints toward their nearest non-self neighbor.

    endpoints: (E,3); strand_endpoint_ids/complementary_ids: (M,) int padded;
    valid: (M,) bool. Follows loss/losses.py:106-172: among the top-3 nearest
    strand endpoints pick the first that is neither self nor the strand's own
    complementary tip, and penalize squared-squared distance.
    """
    pts = endpoints[strand_endpoint_ids]  # (M,3)
    comp_pts = endpoints[complementary_ids]
    self_dir = jax.lax.stop_gradient(pts - comp_pts)
    norm = jnp.linalg.norm(self_dir, axis=1)
    valid = valid & (norm > MIN_VAL)

    # all-pairs distances among the (padded) strand endpoints
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(valid[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 3)
    sq_dists = -neg  # (M,3) ascending
    m = pts.shape[0]
    self_idx = jnp.arange(m)
    # complementary position inside this id list (it may not be a strand
    # endpoint of the list; reference maps via endpoint_mapping — here the
    # complementary of a listed endpoint is itself listed)
    second_ok = (idx[:, 1] != self_idx) & (
        strand_endpoint_ids[idx[:, 1]] != complementary_ids
    )
    chosen_d2 = jnp.where(second_ok, sq_dists[:, 1], sq_dists[:, 2])
    chosen_d2 = jnp.where(valid, chosen_d2, 0.0)
    dists = chosen_d2 * chosen_d2  # reference squares the squared distance
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(dists) / count
