"""
Test doubles (reference: /root/reference/pytassim/testing/dummy.py:39-164).
"""


import jax.numpy as jnp
import numpy as np

from tpu_assim.observation import Observation
from tpu_assim.ops.localization import BaseLocalization
from tpu_assim.state import EnsembleState

__all__ = [
    "dummy_obs_operator",
    "dummy_model",
    "DummyLocalization",
    "dummy_distance",
    "DummyNeuralModule",
]


class dummy_obs_operator:
    """Identity operator on variable 'x' over all grid points
    (reference: testing/dummy.py:39-66)."""

    def __call__(self, obs_ds: Observation, state: EnsembleState) -> jnp.ndarray:
        if "x" in state.var_names:
            v = state.var_names.index("x")
        else:
            v = 0
        values = state.data[v]  # [time, ens, grid]
        state_times = np.asarray(state.times)
        obs_times = np.asarray(obs_ds.times)
        t_idx = [int(np.nonzero(state_times == t)[0][0]) for t in obs_times]
        return jnp.take(values, jnp.asarray(t_idx), axis=0)


def dummy_model(state: EnsembleState, iter_num: int = 0):
    """Identity forward model (reference: testing/dummy.py:109-126)."""
    return state, state


class DummyLocalization(BaseLocalization):
    """Triangular taper weights (reference: testing/dummy.py:129-139)."""

    def localize_obs(self, grid_coord, obs_coords):
        dist = jnp.abs(
            jnp.atleast_2d(obs_coords)[:, 0]
            - jnp.atleast_1d(grid_coord)[-1]
        )
        weights = jnp.clip(1.0 - dist / 10.0, 0.0, None)
        use_obs = weights > 0.0
        return use_obs, weights


def dummy_distance(grid_coord, obs_coords):
    """Absolute distance on the last coordinate column
    (reference: testing/dummy.py:142-151)."""
    return jnp.abs(
        jnp.atleast_2d(obs_coords)[:, -1] - jnp.atleast_1d(grid_coord)[-1]
    )[None, :]


class DummyNeuralModule:
    """Tiny deterministic feature map for ModuleKernel tests
    (reference: testing/dummy.py:154-164)."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([x, jnp.square(x)], axis=-1)
