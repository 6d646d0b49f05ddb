import os

# Tests run on a virtual 8-device CPU mesh.  The container's sitecustomize
# registers the axon TPU backend and force-sets jax_platforms, so the env var
# alone is not enough — override the config directly before any backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
