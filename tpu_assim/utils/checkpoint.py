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

import json

import numpy as np
import jax.numpy as jnp

__all__ = [
    "save_weights",
    "load_weights",
    "save_arrays",
    "load_arrays",
    "save_state",
    "load_state",
    "save_observation",
    "load_observation",
    "save_weights_sharded",
    "load_weights_sharded",
]

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


# ------------------------------------------------------- state / observation
def save_state(path: str, state) -> None:
    """Persist a full :class:`~tpu_assim.state.EnsembleState` — the analog of
    the reference's netCDF save with MultiIndex encoding
    (utilities/xarray.py:36-103): the multi-level grid survives as the
    explicit ``grid_coords`` matrix, the labels as a JSON attribute."""
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=np.asarray(state.data))
        f.create_dataset("times", data=np.asarray(state.times))
        f.create_dataset("grid_coords", data=np.asarray(state.grid_coords))
        f.attrs["var_names"] = json.dumps([str(v) for v in state.var_names])
        f.attrs["ens_members"] = json.dumps(list(state.ens_members))


def load_state(path: str):
    """Load an :class:`~tpu_assim.state.EnsembleState`
    (reference: utilities/xarray.py:104-173 decode path)."""
    import h5py

    from tpu_assim.state import EnsembleState

    with h5py.File(path, "r") as f:
        return EnsembleState(
            jnp.asarray(np.asarray(f["data"])),
            times=jnp.asarray(np.asarray(f["times"])),
            grid_coords=jnp.asarray(np.asarray(f["grid_coords"])),
            var_names=tuple(json.loads(f.attrs["var_names"])),
            ens_members=tuple(json.loads(f.attrs["ens_members"])),
        )


def save_observation(path: str, obs) -> None:
    """Persist an :class:`~tpu_assim.observation.Observation` (all arrays +
    the correlated flag; the operator callable is not serialized, matching
    the reference where operators are re-attached after load)."""
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("observations", data=np.asarray(obs.observations))
        f.create_dataset("covariance", data=np.asarray(obs.covariance))
        f.create_dataset("obs_coords", data=np.asarray(obs.obs_coords))
        f.create_dataset("times", data=np.asarray(obs.times))
        f.attrs["correlated"] = bool(obs.correlated)


def load_observation(path: str):
    import h5py

    from tpu_assim.observation import Observation

    with h5py.File(path, "r") as f:
        return Observation(
            jnp.asarray(np.asarray(f["observations"])),
            jnp.asarray(np.asarray(f["covariance"])),
            obs_coords=jnp.asarray(np.asarray(f["obs_coords"])),
            times=jnp.asarray(np.asarray(f["times"])),
            correlated=bool(f.attrs["correlated"]),
        )


# --------------------------------------------------------- sharded weights
def save_weights_sharded(path: str, weights) -> None:
    """Async orbax save of a (possibly sharded) weight tensor — the
    multi-host checkpoint path (SURVEY §5.4: weights [grid, k, k] are the
    natural checkpoint tensor). Falls back to the HDF5 path when orbax is
    unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        save_weights(path, weights)
        return
    import os

    ckptr = ocp.StandardCheckpointer()
    # orbax's standard handler takes pytrees, not bare arrays
    ckptr.save(os.path.abspath(path), {_WEIGHTS_KEY: weights}, force=True)
    ckptr.wait_until_finished()


def load_weights_sharded(path: str, sharding=None):
    """Load an orbax weight checkpoint, optionally restoring directly into a
    target ``jax.sharding`` layout (zero host-gather on multi-host)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return load_weights(path)
    import os

    import jax

    ckptr = ocp.StandardCheckpointer()
    if sharding is None:
        return ckptr.restore(os.path.abspath(path))[_WEIGHTS_KEY]
    meta = ckptr.metadata(os.path.abspath(path)).item_metadata[_WEIGHTS_KEY]
    target = {
        _WEIGHTS_KEY: jax.ShapeDtypeStruct(meta.shape, meta.dtype, sharding=sharding)
    }
    return ckptr.restore(os.path.abspath(path), target)[_WEIGHTS_KEY]
