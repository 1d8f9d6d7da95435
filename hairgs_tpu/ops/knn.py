"""Brute-force tiled k-nearest-neighbor ops on device.

TPU-native replacements for:
- simple-knn `distCUDA2` (submodules/simple-knn/simple_knn.cu:186-222) — the
  Morton-sorted boxed search is a GPU memory-locality trick; on TPU a chunked
  all-pairs distance via one MXU matmul per chunk is simpler and fast at the
  <=1M-point scale it is used at (once, at model init).
- pytorch3d `knn_points` (used at scene/hair_gaussian_model.py:1388 and
  loss/losses.py:140-145).
"""

import functools

import jax
import jax.numpy as jnp


def _chunk_dists(query_chunk, points):
    """Squared distances (Q, N) via |q|^2 + |p|^2 - 2 q.p (matmul on MXU)."""
    qq = jnp.sum(query_chunk * query_chunk, axis=-1, keepdims=True)
    pp = jnp.sum(points * points, axis=-1)
    qp = query_chunk @ points.T
    d = qq + pp[None, :] - 2.0 * qp
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "exclude_self"))
def knn(queries, points, k: int, valid=None, chunk: int = 1024, exclude_self: bool = False):
    """k nearest neighbors of `queries` among `points`.

    Returns (sq_dists (Q,k), indices (Q,k)) sorted ascending. `valid` masks
    points out of consideration. With exclude_self=True, a point at distance
    exactly 0 ... is still returned (callers drop it) — matching pytorch3d
    semantics where self-matches appear first.
    """
    q = queries.shape[0]
    pad = (-q) % chunk
    queries_p = jnp.pad(queries, ((0, pad), (0, 0)))
    nq = queries_p.shape[0]

    big = jnp.float32(jnp.inf)

    def body(qc):
        d = _chunk_dists(qc, points)
        if valid is not None:
            d = jnp.where(valid[None, :], d, big)
        negd, idx = jax.lax.top_k(-d, k)
        return -negd, idx

    qs = queries_p.reshape(nq // chunk, chunk, -1)
    dists, idxs = jax.lax.map(body, qs)
    dists = dists.reshape(nq, k)[:q]
    idxs = idxs.reshape(nq, k)[:q]
    return dists, idxs


def mean_sq_dist_3nn(points, valid=None, chunk: int = 1024):
    """Mean of squared distances to the 3 nearest neighbors (excluding self).

    Parity target: simple_knn distCUDA2 (spatial.cu:15-26) used once at init
    (scene/gaussian_model.py:176-179) to set initial Gaussian scales.
    """
    d, _ = knn(points, points, k=4, valid=valid, chunk=chunk)
    # first hit is self (distance 0)
    return jnp.mean(d[:, 1:4], axis=1)


def estimate_pointcloud_normals(points, k: int = 50, chunk: int = 1024):
    """Per-point normals via kNN-PCA.

    Parity target: pytorch3d `estimate_pointcloud_normals`
    (pytorch3d/ops/points_normals.py, used at reference
    data/hair_data.py:127 to light the USC synthetic renders): each point's
    normal is the eigenvector of its k-neighborhood covariance with the
    smallest eigenvalue. The self-match counts as a neighbor (knn returns it
    at distance 0, same as pytorch3d's knn_points). Sign is arbitrary — the
    reference runs without orientation disambiguation and its Lambert term
    clamps at 0, so half the strands go ambient-only there too.
    """
    pts = jnp.asarray(points, jnp.float32)
    k = min(k, pts.shape[0])
    _, idx = knn(pts, pts, k, chunk=chunk)
    nbrs = pts[idx]  # (N, k, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    return vecs[..., 0]  # (N, 3), unit norm by construction
