"""Worker for the real 8-process CPU-mesh multihost test (see
tests/test_multihost.py). Each process owns ONE virtual CPU device; the mesh
spans all processes over gloo collectives.

Run: python multihost_worker.py <pid> <nproc> <port> <workdir>
Prints "RANK <pid> OK" on success.
"""

import os
import sys


def main():
    pid, nproc, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from hairgs_tpu.parallel.multihost import (
        global_view_batch,
        host_camera_indices,
        load_sharded_state,
        save_sharded_state,
    )

    assert jax.device_count() == nproc and jax.local_device_count() == 1
    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    # --- per-host camera loading: this host materializes ONLY its own
    # camera's image payload, then contributes its slice of the global batch
    n_cameras = nproc * 2
    mine = host_camera_indices(n_cameras)
    assert len(mine) == 2 and all(i % nproc == pid for i in mine)
    local_img = np.full((1, 8, 8, 3), float(mine[0]), np.float32)
    batch = global_view_batch({"image": local_img}, mesh)
    assert batch["image"].shape == (nproc, 8, 8, 3)

    # a collective over the assembled batch proves the cross-process mesh
    total = jax.jit(
        lambda b: jnp.sum(jnp.mean(b, axis=(1, 2, 3))),
        out_shardings=NamedSharding(mesh, P()),
    )(batch["image"])
    want = sum(
        float(host_camera_indices(n_cameras, q, nproc)[0])
        for q in range(nproc)
    )
    assert abs(float(total) - want) < 1e-5, (float(total), want)

    # --- sharded checkpoint: save each host's slab rows, reload into a
    # fresh template, verify this host's blocks round-tripped exactly
    rows = nproc * 4
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    local_rows = np.arange(pid * 4, (pid + 1) * 4, dtype=np.float32)
    local_block = np.stack([local_rows + 0.25 * c for c in range(3)], -1)
    state = {
        "endpoints": jax.make_array_from_single_device_arrays(
            (rows, 3), shard,
            [jax.device_put(local_block, jax.local_devices()[0])]),
        "lr_scale": jax.device_put(jnp.asarray([2.5]), repl),
    }
    ckpt = os.path.join(workdir, "ckpt")
    save_sharded_state(ckpt, state, step=7)
    # barrier so every shard file exists before anyone loads (a replicated
    # all-reduce forces every process past its save)
    jax.block_until_ready(
        jax.jit(jnp.sum, out_shardings=repl)(
            jax.make_array_from_single_device_arrays(
                (nproc,), shard,
                [jax.device_put(jnp.zeros((1,)), jax.local_devices()[0])]))
    )

    template = {
        "endpoints": jax.device_put(jnp.zeros((rows, 3)), shard),
        "lr_scale": jax.device_put(jnp.zeros((1,)), repl),
    }
    loaded, step = load_sharded_state(ckpt, template)
    assert step == 7
    got = np.asarray(loaded["endpoints"].addressable_shards[0].data)
    np.testing.assert_array_equal(got, local_block)
    np.testing.assert_array_equal(
        np.asarray(loaded["lr_scale"].addressable_shards[0].data), [2.5])
    print(f"RANK {pid} OK", flush=True)


if __name__ == "__main__":
    main()
