"""Test configuration: force CPU with 8 virtual devices so sharding/mesh tests
run anywhere (mirrors the driver's multi-chip dry-run environment).

Note: jax may already be imported when this runs (pytest plugin autoload), so
setting JAX_PLATFORMS alone is not enough — update the live config too. This
works as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
