"""Depth-slab Gaussian-axis sharding (SURVEY §2.3 "spatial sharding").

Scale-out path for scenes whose pair tables / arenas outgrow one chip's HBM
(the reference has no analogue — it is single-GPU by construction,
utils/general.py:116). Design (docs/ROADMAP.md §6):

- Per camera, partition the N-Gaussian axis into k contiguous *depth slabs*
  (front-to-back) by sorting on view-space z. Contiguity in depth is what
  makes per-slab compositing order-correct: every Gaussian in slab i is in
  front of every Gaussian in slab i+1, so the per-tile depth-sorted order of
  the full render is exactly the concatenation of the slabs' orders.
- Each device composites ONLY its slab with the ordinary renderer, producing
  a partial (color, transmittance) image — an alpha-compositing *segment*.
- Segments compose associatively: (c1,T1) ∘ (c2,T2) = (c1 + T1·c2, T1·T2).
  The k partials are folded front-to-back over the mesh axis (an all_gather
  of k small images over ICI followed by a k-step fold; k ≤ 8 so a log-depth
  ppermute scan buys nothing).

Memory economics: each device holds N/k Gaussians' pair tables and paged
binning buffers — the dominant allocation — while the merged image costs
k·H·W·(C+1) floats once. Resharding (the depth sort) is a per-camera
gather, fused by XLA.

Differentiable end-to-end: the slab permutation is an integer gather, the
per-slab render carries its own custom VJP, and the fold is plain jnp.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hairgs_tpu.render.renderer import RasterConfig, render


def _depth_slab_permutation(means3d, active, world_view):
    """Front-to-back permutation of the Gaussian axis by view-space z.

    Inactive rows sort to the back (+inf key) so they pad the last slab.
    Returns (perm, inv_perm): gather indices such that x[perm] is
    depth-ordered and y[inv_perm] undoes it.
    """
    depth = means3d @ world_view[2, :3] + world_view[2, 3]
    key = jnp.where(active, depth, jnp.inf) if active is not None else depth
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)
    return perm, inv_perm


def compose_segments(images, final_ts):
    """Fold k alpha-compositing segments front-to-back.

    images: (k,H,W,C) partial colors; final_ts: (k,H,W) partial
    transmittances. Returns (merged (H,W,C), T (H,W)).
    """

    def step(carry, seg):
        c, t = carry
        ci, ti = seg
        return (c + t[..., None] * ci, t * ti), None

    init = (jnp.zeros_like(images[0]), jnp.ones_like(final_ts[0]))
    (color, t), _ = jax.lax.scan(step, init, (images, final_ts))
    return color, t


def render_gauss_sharded(
    camera,
    *,
    means3d: jnp.ndarray,
    opacity: jnp.ndarray,
    features: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    width: int,
    height: int,
    config: RasterConfig = RasterConfig(),
    mesh: Mesh,
    axis_name: str = "gauss",
):
    """Depth-slab sharded version of render(): same signature surface, same
    output dict, Gaussian axis split over `mesh[axis_name]`.

    Per-slab capacities (max_pairs_per_tile etc.) apply to each slab
    independently, so the aggregate pair capacity scales with the mesh.
    """
    k = mesh.shape[axis_name]
    n = means3d.shape[0]
    assert n % k == 0, (
        f"Gaussian capacity {n} must divide the {axis_name} axis size {k} "
        f"(capacity_round should be a multiple of the mesh size)"
    )
    if active is None:
        active = jnp.ones((n,), bool)

    perm, inv_perm = _depth_slab_permutation(means3d, active, camera.world_view)

    def g(x):
        return None if x is None else x[perm]

    cam_light = camera._replace(image=None, mask=None, orientation=None,
                                confidence=None)

    def slab(cam, m3, opa, feat, sc, rot, act, off):
        out = render(
            cam, means3d=m3, opacity=opa, features=feat, scales=sc,
            rotations=rot, active=act, mean2d_offset=off, bg=None,
            width=width, height=height, config=config,
        )
        return (
            out["render"][None],
            out["render_photo"][None],
            out["final_T"][None],
            out["radii"],
            jnp.reshape(out["overflow_pairs"], (1,)),
            jnp.reshape(out["overflow_tiles"], (1,)),
        )

    spec_g = P(axis_name)
    sharded_slab = jax.shard_map(
        slab,
        mesh=mesh,
        in_specs=(P(), spec_g, spec_g, spec_g, spec_g, spec_g, spec_g,
                  None if mean2d_offset is None else spec_g),
        out_specs=(spec_g, spec_g, spec_g, spec_g, spec_g, spec_g),
        check_vma=False,
    )
    imgs, imgs_photo, ts, radii_p, opairs, otiles = sharded_slab(
        cam_light, g(means3d), g(opacity), g(features), g(scales),
        g(rotations), g(active), g(mean2d_offset),
    )

    image, final_t = compose_segments(imgs, ts)
    image_photo, _ = compose_segments(imgs_photo, ts)
    if bg is not None:
        image = image + final_t[..., None] * bg
        image_photo = image_photo + final_t[..., None] * bg

    radii = radii_p[inv_perm]
    return {
        "render": image,
        "render_photo": image_photo,
        "final_T": final_t,
        "radii": radii,
        "visibility_filter": radii > 0,
        "overflow_pairs": jnp.sum(opairs),
        "overflow_tiles": jnp.sum(otiles),
    }


def gauss_mesh(num_devices: Optional[int] = None) -> Mesh:
    """Mesh with a single "gauss" model axis (composable with a "data" view
    axis by reshaping jax.devices() into a 2D mesh when both are wanted)."""
    import numpy as np

    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("gauss",))
