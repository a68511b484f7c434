"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Multi-chip shardings are validated without real TPU hardware by forcing the
host platform to expose 8 virtual devices (the standard JAX technique for
testing pjit/shard_map topologies).

Note: in this environment the JAX_PLATFORMS env var is overridden by the
preinstalled TPU plugin, so the platform must be forced via
``jax.config.update`` before any computation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
