"""
Weight checkpointing.

The reference persists ensemble weights as netCDF with MultiIndex
encode/decode (/root/reference/pytassim/utilities/xarray.py:36-173,
interface/base.py:280-325). Here weights are plain dense arrays
(``[k, m]`` global or ``[grid, k, m]`` localized); they are stored as HDF5
(h5py) — the natural host-side artifact for the sharded-array pipeline. For
large multi-host runs use :mod:`tpu_assim.parallel` with orbax-style async
saves of the sharded weight tensor.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["save_weights", "load_weights", "save_arrays", "load_arrays"]

_WEIGHTS_KEY = "ensemble_weights"


def save_arrays(path: str, arrays: dict):
    """Save a flat dict of arrays to an HDF5 file."""
    import h5py

    with h5py.File(path, "w") as f:
        for key, value in arrays.items():
            f.create_dataset(key, data=np.asarray(value))


def load_arrays(path: str) -> dict:
    """Load a flat dict of arrays from an HDF5 file."""
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for key in f.keys():
            out[key] = np.asarray(f[key])
    return out


def save_weights(path: str, weights) -> None:
    """Persist ensemble weights (reference: interface/base.py:280-302)."""
    save_arrays(path, {_WEIGHTS_KEY: weights})


def load_weights(path: str):
    """Load ensemble weights (reference: interface/base.py:304-325)."""
    return jnp.asarray(load_arrays(path)[_WEIGHTS_KEY])
