"""
Test configuration.

Tests run on a virtual 8-device CPU mesh (the multi-chip sharding tests
need multiple devices; real TPU hardware is only used by bench.py). The env
must be set before jax import — and the axon TPU plugin must be disabled by
clearing PALLAS_AXON_POOL_IPS, otherwise it overrides JAX_PLATFORMS.

float64 is enabled globally: the reference defaults to float64
(/root/reference/pytassim/interface/base.py:73) and its parity oracles use
rtol=atol=1e-10 (tests/unit_tests/interface/test_letkf.py:69-70), which f32
cannot meet.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

# The axon TPU plugin (sitecustomize) may have registered before this
# conftest ran and forced jax_platforms="axon,cpu"; pin tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
