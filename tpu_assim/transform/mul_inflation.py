"""
Multiplicative covariance inflation transform
(reference: /root/reference/pytassim/transform/mul_inflation.py:28-127):
ensemble perturbations are scaled by ``sqrt(inf_factor)`` so the ensemble
covariance inflates by ``inf_factor``. ``pre`` = prior inflation of
background (and first guess); ``post`` = posterior inflation of the analysis.
"""

from typing import Iterable, Optional

import jax.numpy as jnp

from tpu_assim.observation import Observation
from tpu_assim.state import EnsembleState
from tpu_assim.transform.base import BaseTransformer

__all__ = ["MultiplicativeInflation"]


class MultiplicativeInflation(BaseTransformer):
    def __init__(self, inf_factor: float = 1.0):
        super().__init__()
        self.inf_factor = inf_factor

    def _inflate_array(self, state: EnsembleState) -> EnsembleState:
        """(reference: mul_inflation.py:47-52)"""
        mean = jnp.mean(state.data, axis=2, keepdims=True)
        perts = state.data - mean
        inflated = mean + jnp.sqrt(self.inf_factor) * perts
        return state.replace(data=inflated)

    def pre(
        self,
        background: EnsembleState,
        observations: Iterable[Observation],
        first_guess: Optional[EnsembleState] = None,
    ):
        """(reference: mul_inflation.py:54-95)"""
        inflated_background = self._inflate_array(background)
        if isinstance(first_guess, EnsembleState):
            first_guess = self._inflate_array(first_guess)
        return inflated_background, observations, first_guess

    def post(
        self,
        analysis: EnsembleState,
        background: EnsembleState,
        observations: Iterable[Observation],
        first_guess: Optional[EnsembleState] = None,
    ) -> EnsembleState:
        """(reference: mul_inflation.py:97-127)"""
        return self._inflate_array(analysis)
