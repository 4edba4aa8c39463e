"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere, hence the env mutation at module
import time (pytest imports conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The 'axon' TPU plugin in this image re-pins jax_platforms at import time;
# the config update (post-import) wins over it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
