"""core/hostsync.sliced_pull: pad-free batched device->host pulls."""

import numpy as np
import jax.numpy as jnp

from hairgs_tpu.core.hostsync import GRANULE, sliced_pull


class TestSlicedPull:
    def test_trims_to_requested_rows(self):
        arr = jnp.arange(100.0).reshape(50, 2)
        out = sliced_pull({"x": (arr, 7)})
        np.testing.assert_array_equal(out["x"], np.arange(14.0).reshape(7, 2))

    def test_writable(self):
        arr = jnp.ones((8, 3))
        out = sliced_pull({"x": (arr, 8)})
        out["x"][0] = 5.0  # host mirrors mutate in place
        assert out["x"][0, 0] == 5.0

    def test_full_capacity_and_zero_rows(self):
        arr = jnp.arange(12.0).reshape(6, 2)
        out = sliced_pull({"a": (arr, 6), "b": (arr, 0)})
        assert out["a"].shape == (6, 2)
        assert out["b"].shape == (0, 2)

    def test_granule_bucketing_caps_at_capacity(self):
        n = GRANULE + 5
        arr = jnp.zeros((n, 1))
        out = sliced_pull({"x": (arr, GRANULE + 1)})
        assert out["x"].shape == (GRANULE + 1, 1)

    def test_batched_keys_pull_consistently(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(33, 3)).astype(np.float32)
        b = rng.normal(size=(40, 1)).astype(np.float32)
        out = sliced_pull({"a": (jnp.asarray(a), 20), "b": (jnp.asarray(b), 40)})
        np.testing.assert_array_equal(out["a"], a[:20])
        np.testing.assert_array_equal(out["b"], b)
