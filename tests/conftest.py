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

# TAFL_TEST_PLATFORM=tpu runs the suite against the real backend (used to
# exercise the COMPILED pallas kernels; see kernel_interpret_modes).
if os.environ.get("TAFL_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def kernel_interpret_modes():
    """Pallas kernel modes to test: interpret mode always; the compiled
    (Mosaic) kernel auto-activates when the suite runs on a TPU backend
    (``TAFL_TEST_PLATFORM=tpu``), so a Mosaic lowering regression cannot
    ship silently."""
    modes = [True]
    if jax.default_backend() == "tpu":
        modes.append(False)
    return modes
