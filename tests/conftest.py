"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-device sharding is validated on a virtual CPU mesh (the TPU-native
analog of "multi-node testing without a real cluster"); real-TPU runs happen
through bench.py / __graft_entry__.py.

Note: this environment's sitecustomize registers an 'axon' TPU backend and
forces jax_platforms; we override it after import via jax.config.update,
which is honored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
