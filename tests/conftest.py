"""Test configuration.

Tests run on a simulated 8-device CPU mesh so that:
* the suite is fast and hermetic (no per-graph TPU compile latency),
* multi-chip sharding paths are exercised exactly as the driver's
  ``dryrun_multichip`` does, per SURVEY §4's same-program-different-mesh
  testing strategy.

NOTE: this environment pre-imports jax at interpreter startup (axon
sitecustomize) with JAX_PLATFORMS=axon, so plain env vars are ineffective;
we must override via ``jax.config`` before any backend is initialised.

Set ``PROBABILIT_TPU_TEST_TPU=1`` to run the suite on real attached TPUs.
"""

import os

if os.environ.get("PROBABILIT_TPU_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
