"""Multi-host practicals (SURVEY §5.8 / docs/ROADMAP.md §7).

Two layers:
- single-process tests on the 8-virtual-device CPU mesh: camera-ownership
  partitioning, sharded checkpoint round trip for the --gauss_shard arenas
  (incl. replicated + host-side leaves), resume into a fresh template;
- a REAL 8-process CPU run (one device per process, gloo collectives):
  tests/multihost_worker.py exercises per-host camera loading through
  `make_array_from_process_local_data`, a cross-process collective, and the
  per-process sharded checkpoint save/load.
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hairgs_tpu.parallel.multihost import (
    host_camera_indices,
    load_sharded_state,
    save_sharded_state,
)

HERE = os.path.dirname(__file__)


class TestCameraOwnership:
    def test_partition_covers_all_exactly_once(self):
        n = 19
        owned = [host_camera_indices(n, p, 8) for p in range(8)]
        flat = sorted(i for sub in owned for i in sub)
        assert flat == list(range(n))

    def test_balanced(self):
        sizes = [len(host_camera_indices(24, p, 8)) for p in range(8)]
        assert sizes == [3] * 8


class TestShardedCheckpoint:
    def _mesh(self):
        return Mesh(np.asarray(jax.devices()), ("gauss",))

    def test_round_trip_sharded_and_replicated(self, tmp_path):
        mesh = self._mesh()
        shard = NamedSharding(mesh, P("gauss"))
        repl = NamedSharding(mesh, P())
        rng = np.random.default_rng(0)
        state = {
            "params": {
                "endpoints": jax.device_put(
                    jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)),
                    shard),
                "width": jax.device_put(
                    jnp.asarray(rng.normal(size=(32, 1)).astype(np.float32)),
                    shard),
            },
            "step_count": jax.device_put(jnp.asarray([11.0]), repl),
            "host_value": np.asarray([1.0, 2.0]),  # host-side leaf
        }
        save_sharded_state(str(tmp_path), state, step=42)
        template = jax.tree.map(
            lambda x: (jax.device_put(jnp.zeros_like(x), x.sharding)
                       if hasattr(x, "sharding") else np.zeros_like(x)),
            state)
        loaded, step = load_sharded_state(str(tmp_path), template)
        assert step == 42
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # shardings preserved
        assert loaded["params"]["endpoints"].sharding.spec == P("gauss")

    def test_sharded_files_hold_only_local_blocks(self, tmp_path):
        mesh = self._mesh()
        shard = NamedSharding(mesh, P("gauss"))
        state = {"x": jax.device_put(jnp.arange(16.0).reshape(16, 1), shard)}
        save_sharded_state(str(tmp_path), state)
        z = np.load(tmp_path / "shard_0.npz")
        # single process: all 8 blocks live here, each 2 rows
        assert len(z.files) == 8
        for name in z.files:
            assert z[name].shape == (2, 1)


@pytest.mark.parametrize("nproc", [8])
def test_real_eight_process_mesh(tmp_path, nproc):
    """8 OS processes, one CPU device each, gloo collectives: per-host camera
    loading + cross-process psum + sharded checkpoint save/resume."""
    port = 12000 + os.getpid() % 1000
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(p), str(nproc), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK {rank} OK" in out, f"rank {rank} output:\n{out}"
