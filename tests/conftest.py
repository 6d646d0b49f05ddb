import os

# Tests run on a virtual 8-device CPU mesh.  The container's sitecustomize
# registers the axon TPU backend and force-sets jax_platforms, so the env var
# alone is not enough — override the config directly before any backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# DELPHY_TPU_TEST_TPU=1 runs the suite against the real TPU backend instead
# (used each round to execute the TPU-only Pallas equivalence tests,
# doc/BENCH_LOG: "TPU-side test evidence")
if not os.environ.get("DELPHY_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Free compiled executables between test modules.  XLA:CPU JIT-compiled
    programs each hold many small code mmaps; across the whole suite the
    process otherwise exhausts vm.max_map_count (65530) and LLVM aborts with
    'Cannot allocate memory'."""
    yield
    jax.clear_caches()
