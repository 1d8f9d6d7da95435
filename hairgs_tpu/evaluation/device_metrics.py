"""Device-side reconstruction metrics (in-training cadence).

The reference computes eval metrics on host: cKDTree ball queries fanned out
over a multiprocessing Pool of 8 (loss/metrics.py:113-149), which requires
pulling the whole model off-device every eval. This module computes the
point-matching precision/recall/F1 on device with chunked masked ball
queries: distances AND direction dots are both (chunk_q, chunk_p) matmuls, so
the whole metric rides the MXU; `jax.lax.map` over fixed-size chunks keeps
shapes static under jit.

Strand consistency needs per-(gt-strand, pred-strand) vote counts — a sparse
reduction that is host-friendly and device-hostile at 10k x 10k strand
spaces; it stays on the host oracle (`evaluation.metrics.pct_matched_points`)
which the train driver invokes only at its sparse eval cadence.

Fixed-capacity semantics: `valid1`/`valid2` mask padded arena rows, so one
compiled program serves every eval of a run.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit,
    static_argnames=("bidirectional", "q_chunk", "p_chunk"),
)
def matched_mask(
    points1,
    dirs1,
    points2,
    dirs2,
    dist_th,
    cos_th,
    valid1=None,
    valid2=None,
    bidirectional: bool = False,
    q_chunk: int = 1024,
    p_chunk: int = 8192,
):
    """(N1,) bool: p1 points having some p2 point within `dist_th` whose
    direction dot exceeds `cos_th` (|dot| when bidirectional).

    Matches loss/metrics.py:26-56 exactly on the matched-fraction side.
    """
    n1 = points1.shape[0]
    n2 = points2.shape[0]
    pad1 = (-n1) % q_chunk
    pad2 = (-n2) % p_chunk
    if valid1 is None:
        valid1 = jnp.ones((n1,), bool)
    if valid2 is None:
        valid2 = jnp.ones((n2,), bool)

    p1 = jnp.pad(points1, ((0, pad1), (0, 0)))
    d1 = jnp.pad(dirs1, ((0, pad1), (0, 0)))
    v1 = jnp.pad(valid1, (0, pad1))
    p2 = jnp.pad(points2, ((0, pad2), (0, 0)))
    d2 = jnp.pad(dirs2, ((0, pad2), (0, 0)))
    v2 = jnp.pad(valid2, (0, pad2))

    p2c = p2.reshape(-1, p_chunk, 3)
    d2c = d2.reshape(-1, p_chunk, 3)
    v2c = v2.reshape(-1, p_chunk)
    sq_th = dist_th * dist_th

    def q_block(args):
        q, dq, vq = args  # (q_chunk,3) x2, (q_chunk,)
        qq = jnp.sum(q * q, axis=-1, keepdims=True)

        def p_block(carry, block):
            pb, db, vb = block
            d = qq + jnp.sum(pb * pb, axis=-1)[None, :] - 2.0 * (q @ pb.T)
            dots = dq @ db.T
            if bidirectional:
                dots = jnp.abs(dots)
            hit = (d <= sq_th) & (dots >= cos_th) & vb[None, :]
            return carry | jnp.any(hit, axis=1), None

        hit0 = jnp.zeros((q.shape[0],), bool)
        hit, _ = jax.lax.scan(p_block, hit0, (p2c, d2c, v2c))
        return hit & vq

    q_blocks = (
        p1.reshape(-1, q_chunk, 3),
        d1.reshape(-1, q_chunk, 3),
        v1.reshape(-1, q_chunk),
    )
    hits = jax.lax.map(q_block, q_blocks)
    return hits.reshape(-1)[:n1]


def matched_fraction(points1, dirs1, points2, dirs2, dist_th, angle_th_deg,
                     valid1=None, valid2=None, bidirectional=False,
                     q_chunk: int = 1024, p_chunk: int = 8192):
    """Scalar fraction of valid p1 points matched in p2 (device scalar)."""
    cos_th = jnp.float32(np.cos(np.deg2rad(angle_th_deg)))
    m = matched_mask(points1, dirs1, points2, dirs2, jnp.float32(dist_th),
                     cos_th, valid1, valid2, bidirectional=bidirectional,
                     q_chunk=q_chunk, p_chunk=p_chunk)
    if valid1 is None:
        return jnp.mean(m.astype(jnp.float32))
    denom = jnp.maximum(jnp.sum(valid1.astype(jnp.float32)), 1.0)
    return jnp.sum(m.astype(jnp.float32)) / denom


def compute_metrics_device(
    pred_points,
    pred_dirs,
    gt_points,
    gt_dirs,
    dist_ths=None,
    angle_ths=None,
    pred_valid=None,
    gt_valid=None,
    bidirectional: bool = False,
    q_chunk: int = 1024,
    p_chunk: int = 8192,
):
    """precision/recall/f1 over the reference threshold grid, all on device.

    Returns the same dict-of-arrays shape as `evaluation.metrics.compute_metrics`
    minus strand_consistency (host oracle; see module docstring). One fetch of
    2*len(thresholds) scalars per call — no model pull.
    """
    from hairgs_tpu.evaluation.metrics import DEFAULT_ANGLE_THS, DEFAULT_DIST_THS

    dist_ths = DEFAULT_DIST_THS if dist_ths is None else dist_ths
    angle_ths = DEFAULT_ANGLE_THS if angle_ths is None else angle_ths

    precisions, recalls = [], []
    for d, a in zip(dist_ths, angle_ths):
        precisions.append(matched_fraction(
            pred_points, pred_dirs, gt_points, gt_dirs, d, a,
            pred_valid, gt_valid, bidirectional, q_chunk, p_chunk))
        recalls.append(matched_fraction(
            gt_points, gt_dirs, pred_points, pred_dirs, d, a,
            gt_valid, pred_valid, bidirectional, q_chunk, p_chunk))
    p = np.asarray(jax.device_get(precisions))
    r = np.asarray(jax.device_get(recalls))
    denom = np.where(p + r > 0, p + r, 1.0)
    f1 = np.where(p + r > 0, 2 * p * r / denom, 0.0)
    suffix = "(b)" if bidirectional else ""
    thresholds = [f"{d}m&{a}°" for d, a in zip(dist_ths, angle_ths)]
    return {
        "precision" + suffix: p,
        "recall" + suffix: r,
        "f1" + suffix: f1,
    }, thresholds
