"""Test helper functions (reference: /root/reference/pytassim/testing/functions.py:27-47)."""

import jax.numpy as jnp
import numpy as np

__all__ = ["generate_random_weights"]


def generate_random_weights(ens_size: int, seed: int = 42) -> jnp.ndarray:
    """Random valid ensemble weight matrix: identity plus small random mean
    and perturbation parts."""
    rs = np.random.RandomState(seed)
    w_mean = rs.normal(scale=0.1, size=(ens_size, 1))
    w_perts = np.eye(ens_size) + rs.normal(scale=0.05, size=(ens_size, ens_size))
    return jnp.asarray(w_mean + w_perts)
