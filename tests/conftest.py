"""Test harness config: force CPU backend with 8 virtual devices so that
multi-chip sharding logic is exercised without TPU hardware (mirrors the
driver's dryrun environment)."""

import os

# Must run before the first `import jax` anywhere in the test session.
# Hard override: the surrounding environment presets JAX_PLATFORMS=axon (the
# single real TPU chip); tests must run on the virtual CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU plugin and rewrites
# jax_platforms to "axon,cpu" regardless of the env var; undo that here,
# before any backend is initialized, so tests never touch the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
