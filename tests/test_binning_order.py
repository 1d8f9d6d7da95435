"""The two binning paths must order pairs IDENTICALLY, including depth ties.

Round-4/5 on-TPU parity-gate forensics: the pallas path bins on a ~20-bit
quantized [tile|depth] int32 key (binning._quantize_depth) while the XLA
oracle originally sorted exact float depth — near-ties ordered differently
on 17 of the gate scene's 1024 tiles, and compositing is order-dependent at
alpha^2 scale, producing a 2.78e-3 pallas-vs-XLA image error that looked
like (and was chased as) a Mosaic numerics bug. f64 host compositing of the
two legal orders reproduced 2.61e-3 (scripts/order_effect_probe.py). Both
paths now sort the same quantized key; this locks that in with adversarial
depth ties.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hairgs_tpu.render.binning import (
    _quantize_depth,
    bin_gaussians,
    bin_gaussians_sorted,
)

GRID_W, GRID_H, TS = 6, 4, 16
R_MAX, K, CHUNK = 8, 256, 64


def _scene(n, seed, tie_fraction):
    rng = np.random.default_rng(seed)
    w, h = GRID_W * TS, GRID_H * TS
    xy = rng.uniform(0, [w, h], (n, 2)).astype(np.float32)
    r = rng.uniform(4.0, 24.0, n).astype(np.float32)
    depth = rng.uniform(0.3, 10.0, n).astype(np.float32)
    # force quantizer collisions: clusters of gaussians whose depths differ
    # by less than a quantum but whose float order is nontrivial
    n_tie = int(n * tie_fraction)
    base = depth[:n_tie // 4 + 1]
    for i in range(n_tie):
        depth[i] = base[i % base.size] * (1.0 + 1e-9 * (i % 7 - 3))
    rect = np.stack([
        np.clip(((xy[:, 0] - r) // TS), 0, GRID_W).astype(np.int32),
        np.clip(((xy[:, 1] - r) // TS), 0, GRID_H).astype(np.int32),
        np.clip(((xy[:, 0] + r) // TS) + 1, 0, GRID_W).astype(np.int32),
        np.clip(((xy[:, 1] + r) // TS) + 1, 0, GRID_H).astype(np.int32),
    ], axis=1)
    valid = rng.uniform(size=n) > 0.1
    return jnp.asarray(rect), jnp.asarray(depth), jnp.asarray(valid)


@pytest.mark.parametrize("seed,tie_fraction", [(0, 0.0), (1, 0.5), (2, 0.9)])
def test_pair_order_identical_across_paths(seed, tie_fraction):
    rect, depth, valid = _scene(300, seed, tie_fraction)
    sb = bin_gaussians_sorted(rect, depth, valid, GRID_W, GRID_H,
                              R_MAX, K, CHUNK)
    b = bin_gaussians(rect, depth, valid, GRID_W, GRID_H, R_MAX, K)

    paged_src = np.asarray(sb.paged_src)
    starts = np.asarray(sb.starts)
    counts = np.asarray(sb.counts)
    gid = np.asarray(b.gather_idx)
    pv = np.asarray(b.pair_valid)
    n = rect.shape[0]

    mismatched = []
    for t in range(GRID_W * GRID_H):
        s, c = int(starts[t]), int(counts[t])
        gp = paged_src[s:s + c] // R_MAX
        gp = gp[gp < n]
        gx = gid[t][pv[t]]
        if gp.tolist() != gx.tolist():
            mismatched.append(t)
    assert not mismatched, (
        f"pair ORDER differs between bin_gaussians_sorted and bin_gaussians "
        f"on tiles {mismatched[:5]} — compositing order is semantics; "
        f"see binning._quantize_depth"
    )


def test_quantized_key_collides_on_near_ties():
    # sanity: the adversarial scene really does produce quantizer ties
    # (otherwise the parametrized test above proves nothing about ties)
    _, depth, _ = _scene(300, 1, 0.5)
    dq, _ = _quantize_depth(depth, GRID_W * GRID_H)
    dq = np.asarray(dq)
    _, counts = np.unique(dq, return_counts=True)
    assert (counts > 1).any(), "no quantizer collisions in the tie scene"
