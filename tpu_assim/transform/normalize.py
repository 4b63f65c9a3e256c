"""
Z-score normalization transform for ML pipelines
(reference: /root/reference/pytassim/transform/normalize.py:40-151):
``pre`` normalizes background, observations, and first guess by given
(mean, std) statistics; ``post`` de-normalizes the analysis.
"""

from typing import Iterable, Optional, Sequence

from tpu_assim.observation import Observation
from tpu_assim.state import EnsembleState
from tpu_assim.transform.base import BaseTransformer

__all__ = ["Normalizer"]


class Normalizer(BaseTransformer):
    """Parameters mirror the reference (normalize.py:58-77): ``ens_stat`` and
    ``fg_stat`` are (mean, std) pairs for background/first guess; ``obs_stat``
    is a sequence of (mean, std) pairs, one per observation dataset."""

    def __init__(self, ens_stat, obs_stat: Sequence, fg_stat):
        self.ens_stat = ens_stat
        self.obs_stat = obs_stat
        self.fg_stat = fg_stat

    def pre(
        self,
        background: EnsembleState,
        observations: Iterable[Observation],
        first_guess: Optional[EnsembleState] = None,
    ):
        """(reference: normalize.py:79-125)"""
        background = (background - self.ens_stat[0]) / self.ens_stat[1]
        if first_guess is not None:
            first_guess = (first_guess - self.fg_stat[0]) / self.fg_stat[1]
        obs_list = []
        for k, obs in enumerate(observations):
            normed = (obs.observations - self.obs_stat[k][0]) / self.obs_stat[k][1]
            obs_list.append(obs.replace(observations=normed))
        return background, obs_list, first_guess

    def post(
        self,
        analysis: EnsembleState,
        background: EnsembleState,
        observations: Iterable[Observation],
        first_guess: Optional[EnsembleState] = None,
    ) -> EnsembleState:
        """(reference: normalize.py:127-151)"""
        return analysis * self.ens_stat[1] + self.ens_stat[0]
