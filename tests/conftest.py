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


#: The pre-commit truth chain (CLAUDE.md): one golden + one differential +
#: one kernel-interpret test per engine, plus the cheap serde/config guards.
#: ``pytest -m quick`` must stay under ~2 min; the full suite is the gate
#: for engine changes, this is the gate for everything else.
_QUICK = (
    "test_oracle_golden.py::TestPlayOutcome",
    "test_oracle_golden.py::TestShieldwalls::test_regular",
    "test_oracle_golden.py::TestRepetitions::test_repetition_loss",
    "test_env_golden.py::test_shieldwall_step_parity[regular]",
    "test_env_differential.py::test_differential_random_playouts[0-brandubh]",
    "test_step_kernel.py::test_step_batch_matches_vmap_step[brandubh-True]",
    "test_native_engine.py::test_native_differential[brandubh]",
    "test_mcts.py::test_mcts_differential[brandubh]",
    "test_mcts.py::test_config_mode_validation",
    "test_fen.py::",
    "test_compat_and_parallel.py::test_env_value_identity",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast pre-commit truth-chain subset (see conftest)"
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid.split("tests/")[-1]
        if any(nodeid.startswith(q) for q in _QUICK):
            item.add_marker(pytest.mark.quick)


def kernel_interpret_modes():
    """Pallas kernel modes to test: interpret mode always; the compiled
    (Mosaic) kernel auto-activates when the suite runs on a TPU backend
    (``TAFL_TEST_PLATFORM=tpu``), so a Mosaic lowering regression cannot
    ship silently."""
    modes = [True]
    if jax.default_backend() == "tpu":
        modes.append(False)
    return modes
