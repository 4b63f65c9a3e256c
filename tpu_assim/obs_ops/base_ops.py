"""
Observation operator base class
(reference: /root/reference/pytassim/obs_ops/base_ops.py:42-110).

An operator maps an :class:`~tpu_assim.state.EnsembleState` into observation
space. The reference's ``torch_operator`` (a differentiable torch twin of the
numpy ``obs_op``) maps to :meth:`jax_operator`, which returns a pure jnp
callable — here the twin is not a separate implementation, it IS the
implementation, so the two can never drift.
"""

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from tpu_assim.observation import Observation
from tpu_assim.state import EnsembleState

__all__ = ["BaseOperator"]


class BaseOperator:
    """Base observation operator.

    Parameters
    ----------
    len_grid : number of model grid points (reference: base_ops.py:55-60).
    random_state : numpy RandomState for random obs-point draws.
    """

    def __init__(
        self,
        len_grid: int = 40,
        random_state: Optional[np.random.RandomState] = None,
    ):
        self.len_grid = len_grid
        self.random_state = random_state

    def __call__(
        self, obs_ds: Observation, input_state: EnsembleState, *args, **kwargs
    ) -> jnp.ndarray:
        """Apply ``obs_op`` and align the state times to the observation times
        (reference: base_ops.py:62-76 selects ``obs_ds.time``).

        Returns [obs_time, ens, obs].
        """
        pseudo_obs = self.obs_op(input_state, *args, **kwargs)
        state_times = np.asarray(input_state.times)
        obs_times = np.asarray(obs_ds.times)
        t_idx = []
        for t in obs_times:
            match = np.nonzero(state_times == t)[0]
            if match.size == 0:
                raise KeyError(
                    "observation time {0} not present in state times".format(t)
                )
            t_idx.append(int(match[0]))
        return jnp.take(pseudo_obs, jnp.asarray(t_idx), axis=0)

    def obs_op(self, in_state: EnsembleState, *args, **kwargs) -> jnp.ndarray:
        """Map a state to obs space, returning [time, ens, obs] at the state's
        times (abstract; reference: base_ops.py:80-88)."""
        raise NotImplementedError

    def jax_operator(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Return a pure, differentiable jnp callable ``[..., grid] ->
        [..., obs]`` (the reference's ``torch_operator`` analog,
        base_ops.py:90-96)."""
        raise NotImplementedError
