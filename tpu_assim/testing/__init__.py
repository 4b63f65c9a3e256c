"""Testing support (reference: /root/reference/pytassim/testing/)."""

from tpu_assim.testing.dummy import (
    dummy_obs_operator,
    dummy_model,
    DummyLocalization,
    dummy_distance,
    DummyNeuralModule,
)
from tpu_assim.testing.functions import generate_random_weights

__all__ = [
    "dummy_obs_operator",
    "dummy_model",
    "DummyLocalization",
    "dummy_distance",
    "DummyNeuralModule",
    "generate_random_weights",
]
