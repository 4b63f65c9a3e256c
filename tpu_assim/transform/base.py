"""
Pre/post-processing transform API
(reference: /root/reference/pytassim/transform/base.py:38-106).
"""

from typing import Iterable, Optional, Tuple

from tpu_assim.observation import Observation
from tpu_assim.state import EnsembleState

__all__ = ["BaseTransformer"]


class BaseTransformer:
    """Base transformer applied around ``update_state``: ``pre`` maps
    (background, observations, first_guess) before the analysis, ``post``
    maps the analysis afterwards."""

    def pre(
        self,
        background: EnsembleState,
        observations: Iterable[Observation],
        first_guess: Optional[EnsembleState] = None,
    ) -> Tuple[EnsembleState, Iterable[Observation], Optional[EnsembleState]]:
        return background, observations, first_guess

    def post(
        self,
        analysis: EnsembleState,
        background: EnsembleState,
        observations: Iterable[Observation],
        first_guess: Optional[EnsembleState] = None,
    ) -> EnsembleState:
        return analysis
