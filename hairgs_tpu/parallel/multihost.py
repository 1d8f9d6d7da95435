"""Multi-host practicals: per-host camera loading + sharded checkpoints.

The reference is single-process single-GPU (SURVEY §2.3/§5.8 — no NCCL/MPI
anywhere); the shard_map twins in parallel/mesh.py are the multi-host step
TEMPLATE, and this module supplies the two practicals they need to run across
processes (one process per host, mesh over jax.devices() spanning DCN):

- **Per-host camera loading**: each host loads only its own subset of the
  camera images (round-robin by camera index) and contributes its local view
  slice of the global batch with `jax.make_array_from_process_local_data`.
  Reference semantics ("pop a random camera per step", train.py:141-143)
  become "random per host from its subset" — the gradient mean over any K
  distinct views is the same estimator, so view-DP is indifferent to which
  host drew which view.

- **Sharded checkpoint save/load**: each process writes ONLY its addressable
  shards (`shard_<pid>.npz` + a json manifest with global shapes and shard
  offsets) and on resume reads back exactly the slices its local devices
  need. Grown arenas under --gauss_shard therefore never have to be gathered
  onto one host (the device->host link here measures ~1 MB/s — a 500k-segment
  arena gather would take minutes).

Works identically in single-process multi-device mode (the tests exercise
both; an 8-process CPU run over gloo validates the real process boundary).
"""

import json
import os
import warnings
from typing import Dict, List

import numpy as np


def host_camera_indices(n_cameras: int, process_index: int = None,
                        process_count: int = None) -> List[int]:
    """Round-robin camera ownership: host p loads cameras {i : i % P == p}.

    Deterministic and balanced for any (n_cameras, P); every camera is owned
    by exactly one host."""
    import jax

    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    return [i for i in range(n_cameras) if i % n == p]


def global_view_batch(local_batch, mesh, axis_name: str = "data"):
    """Assemble a globally-sharded camera batch from per-host local stacks.

    local_batch: a Camera pytree whose array leaves have a leading local-view
    axis (this host's slice of the global batch, len = global_batch /
    process_count). Returns the same pytree with jax.Arrays sharded over
    `axis_name` — feed it to the shard_map / GSPMD steps directly."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, local_batch)


def _leaf_paths(tree) -> Dict[str, "np.ndarray"]:
    """Flatten a pytree into {json-path: leaf} with deterministic keys."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = leaf
    return out


def save_sharded_state(ckpt_dir: str, tree, step: int = 0) -> None:
    """Each process writes its addressable shards; process 0 writes the
    manifest. Layout:

        <ckpt_dir>/manifest.json        {key: {shape, dtype, shards: {...}}}
        <ckpt_dir>/shard_<pid>.npz      {key__<start0>_<start1>...: block}

    Replicated arrays are stored once (by process 0). Restartable with any
    process layout that produces the same shard boundaries (same mesh)."""
    import jax

    os.makedirs(ckpt_dir, exist_ok=True)
    pid = jax.process_index()
    leaves = _leaf_paths(tree)
    local: Dict[str, np.ndarray] = {}
    manifest = {"step": step, "arrays": {}}
    for key, leaf in leaves.items():
        if leaf is None:
            continue
        arr = leaf
        if not hasattr(arr, "addressable_shards"):
            # host-side value: replicated by construction
            if pid == 0:
                local[f"{key}__R"] = np.asarray(arr)
            manifest["arrays"][key] = {
                "shape": list(np.shape(arr)),
                "dtype": str(np.asarray(arr).dtype),
                "replicated": True,
            }
            continue
        replicated = arr.is_fully_replicated
        manifest["arrays"][key] = {
            "shape": list(arr.shape),
            "dtype": str(arr.dtype),
            "replicated": bool(replicated),
        }
        if replicated:
            if pid == 0:
                local[f"{key}__R"] = np.asarray(
                    arr.addressable_shards[0].data)
            continue
        seen = set()
        for shard in arr.addressable_shards:
            starts = tuple(
                0 if sl.start is None else int(sl.start)
                for sl in shard.index
            )
            if starts in seen:  # same block on several local devices
                continue
            seen.add(starts)
            tag = "_".join(str(s) for s in starts)
            local[f"{key}__{tag}"] = np.asarray(shard.data)
    np.savez(os.path.join(ckpt_dir, f"shard_{pid}.npz"), **local)
    if pid == 0:
        with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)


def load_sharded_state(ckpt_dir: str, template_tree, mesh=None):
    """Rebuild the checkpoint with the template's tree structure/shardings.

    template_tree supplies structure AND target sharding per leaf (e.g. the
    freshly-initialized model state). Sharded leaves are read from whichever
    process file holds each locally-needed block; replicated leaves come from
    shard_0.npz (every process needs read access to the checkpoint dir — on
    multi-host this is the usual shared filesystem assumption)."""
    import jax

    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)

    # index every stored block: key -> {starts_tag: (pid,)}
    files = {}
    block_of = {}
    for fname in os.listdir(ckpt_dir):
        if not fname.startswith("shard_") or not fname.endswith(".npz"):
            continue
        z = np.load(os.path.join(ckpt_dir, fname))
        files[fname] = z
        for name in z.files:
            block_of[name] = fname

    leaves_t = _leaf_paths(template_tree)
    out_leaves = {}
    # Schema-drift guards: a renamed/added state field silently resuming
    # from its fresh-init value (or a stored field with nowhere to go) would
    # corrupt a resumed run undetected.
    missing = [k for k, leaf in leaves_t.items()
               if leaf is not None and k not in manifest["arrays"]]
    if missing:
        raise KeyError(
            f"load_sharded_state: template leaves absent from checkpoint "
            f"manifest {sorted(missing)} — schema drift? (checkpoint keys: "
            f"{sorted(manifest['arrays'])[:20]}...)")
    orphaned = [k for k in manifest["arrays"] if k not in leaves_t]
    if orphaned:
        warnings.warn(
            f"load_sharded_state: checkpoint entries with no matching "
            f"template leaf are ignored: {sorted(orphaned)}")
    for key, leaf in leaves_t.items():
        if leaf is None or key not in manifest["arrays"]:
            out_leaves[key] = leaf
            continue
        meta = manifest["arrays"][key]
        if meta["replicated"]:
            data = files[block_of[f"{key}__R"]][f"{key}__R"]
            if hasattr(leaf, "sharding"):
                out_leaves[key] = jax.device_put(data, leaf.sharding)
            else:
                out_leaves[key] = data
            continue
        sharding = leaf.sharding
        shape = tuple(meta["shape"])
        idx_map = sharding.addressable_devices_indices_map(shape)
        singles = []
        devs = []
        for dev, index in idx_map.items():
            starts = tuple(
                0 if sl.start is None else int(sl.start) for sl in index
            )
            tag = "_".join(str(s) for s in starts)
            name = f"{key}__{tag}"
            block = files[block_of[name]][name]
            singles.append(jax.device_put(block, dev))
            devs.append(dev)
        out_leaves[key] = jax.make_array_from_single_device_arrays(
            shape, sharding, singles)

    # re-assemble with the template's structure
    flat, treedef = jax.tree_util.tree_flatten_with_path(template_tree)
    ordered = []
    for path, _ in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        ordered.append(out_leaves[key])
    return jax.tree_util.tree_unflatten(treedef, ordered), manifest["step"]
