"""TPU-gated tests: run on the real chip (no platform pinning, unlike
tests/conftest.py which forces a virtual CPU mesh). Collected separately:
``python -m pytest tests_tpu/ -q`` — each test skips itself off-TPU."""
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
