"""Device-mesh data parallelism over camera views.

The reference is single-process single-GPU with no distributed execution of
any kind (utils/general.py:116 pins cuda:0; no NCCL/MPI anywhere — SURVEY
§2.3/§5.8). On TPU the natural parallelism of multi-view splatting is data
parallelism over views: each chip renders + differentiates its own camera
minibatch slice against the replicated model, and the gradient mean over the
batch axis becomes an all-reduce over ICI that XLA inserts automatically from
the sharding annotations.

Axes:
- "data": view minibatch axis (primary; scales to pod slices over DCN too)
- a "gauss" model-axis sharding of the N-Gaussian dimension is the documented
  scale-out option for preprocess once scene sizes outgrow one chip's HBM;
  hair scenes (<=1e6 primitives) fit comfortably, so the model is replicated.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_view_mesh(view_batch: int, mesh_data_axis: int = 0) -> Optional[Mesh]:
    """Mesh for the train driver's view-batch DP, or None when one device
    suffices. Uses the largest device count <= min(local devices, view_batch)
    that divides view_batch (even shards keep shapes static under jit)."""
    if view_batch <= 1:
        return None
    n = mesh_data_axis if mesh_data_axis > 0 else min(len(jax.devices()), view_batch)
    n = min(n, len(jax.devices()), view_batch)
    while view_batch % n:
        n -= 1
    if n <= 1:
        return None
    return make_mesh(n)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_view_batch(camera_batch, mesh: Mesh, axis_name: str = "data"):
    """Shard a batched Camera pytree along its leading (view) axis."""

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(axis_name)))

    return jax.tree.map(put, camera_batch)


def make_sharded_gaussian_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (batched-camera) train step with mesh shardings.

    Model state is replicated; the camera batch is sharded over `axis_name`.
    The mean over views inside the step lowers to a psum over ICI.
    """
    repl = NamedSharding(mesh, P())

    def wrapped(params, stats, opt_state, active, camera_batch, step):
        params = jax.device_put(params, repl)
        stats = jax.device_put(stats, repl)
        opt_state = jax.device_put(opt_state, repl)
        active = jax.device_put(active, repl)
        camera_batch = shard_view_batch(camera_batch, mesh, axis_name)
        return step_fn(params, stats, opt_state, active, camera_batch, step)

    return wrapped


def make_sharded_hair_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    repl = NamedSharding(mesh, P())

    def wrapped(params, graph, stats, opt_state, camera_batch, step,
                smooth_pairs, smooth_valid, magnet_idx=None):
        params = jax.device_put(params, repl)
        graph = jax.device_put(graph, repl)
        stats = jax.device_put(stats, repl)
        opt_state = jax.device_put(opt_state, repl)
        smooth_pairs = jax.device_put(smooth_pairs, repl)
        smooth_valid = jax.device_put(smooth_valid, repl)
        if magnet_idx is not None:
            magnet_idx = jax.device_put(magnet_idx, repl)
        camera_batch = shard_view_batch(camera_batch, mesh, axis_name)
        return step_fn(params, graph, stats, opt_state, camera_batch, step,
                       smooth_pairs, smooth_valid, magnet_idx=magnet_idx)

    return wrapped
