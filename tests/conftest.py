"""Test harness: hermetic CPU runs with a virtual 8-device mesh.

The reference has no automated tests (SURVEY.md section 4); this suite is
new. All tests run on the CPU backend with 8 virtual devices so that
sharding/pjit paths are exercised without TPU hardware.

Environment variables must be set before the first jax import, hence the
module-level assignments here (pytest imports conftest before tests).
"""

import os
import sys

# Hard override: the shell environment pins JAX_PLATFORMS to the TPU
# tunnel; tests must be hermetic on CPU. ATDN_TEST_TPU=1 opts out for
# the (explicitly TPU-gated) chip tests, run manually on the real
# device: ATDN_TEST_TPU=1 pytest tests -m tpu
_ON_TPU = os.environ.get("ATDN_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The TPU-tunnel sitecustomize pre-imports jax, which snapshots
# JAX_PLATFORMS at import time — the env assignment above is then too
# late. Force the config directly as well (safe either way).
import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-bound (hundreds of
# jit graphs on a 2-core box); caching makes repeat runs ~5x faster.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
