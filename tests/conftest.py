"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware.

Note: the environment may pre-register an experimental TPU platform via
sitecustomize; `jax.config.update("jax_platforms", "cpu")` after import is
the override that actually wins there.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "float32")
