"""Persistence + coordinate-helper tests (reference genre 7: serialization
roundtrips keep coordinates, tests/unit_tests/utlities/test_xarray.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_assim.state import EnsembleState
from tpu_assim.observation import Observation
from tpu_assim.utils.checkpoint import (
    load_observation,
    load_state,
    load_weights,
    load_weights_sharded,
    save_observation,
    save_state,
    save_weights,
    save_weights_sharded,
)
from tpu_assim.utils.coords import (
    index_to_array,
    multiindex_to_array,
    times_to_seconds,
)


class TestPersistence:
    def test_weights_roundtrip(self, rng, tmp_path):
        w = rng.normal(size=(16, 10, 10))
        path = str(tmp_path / "weights.h5")
        save_weights(path, w)
        np.testing.assert_array_equal(np.asarray(load_weights(path)), w)

    def test_state_roundtrip(self, rng, tmp_path):
        state = EnsembleState(
            rng.normal(size=(2, 3, 5, 8)),
            times=np.array([0.0, 10.0, 20.0]),
            grid_coords=rng.normal(size=(8, 2)),
            var_names=("T", "q"),
            ens_members=(0, 1, 2, 3, 4),
        )
        path = str(tmp_path / "state.h5")
        save_state(path, state)
        loaded = load_state(path)
        assert loaded.valid
        np.testing.assert_array_equal(np.asarray(loaded.data),
                                      np.asarray(state.data))
        np.testing.assert_array_equal(np.asarray(loaded.grid_coords),
                                      np.asarray(state.grid_coords))
        assert loaded.var_names == ("T", "q")
        assert loaded.ens_members == (0, 1, 2, 3, 4)

    def test_observation_roundtrip(self, rng, tmp_path):
        obs = Observation(
            rng.normal(size=(2, 6)),
            rng.uniform(0.5, 1.5, size=6),
            obs_coords=rng.normal(size=(6, 2)),
            times=np.array([0.0, 10.0]),
        )
        path = str(tmp_path / "obs.h5")
        save_observation(path, obs)
        loaded = load_observation(path)
        assert loaded.valid
        assert not loaded.correlated
        np.testing.assert_array_equal(np.asarray(loaded.observations),
                                      np.asarray(obs.observations))
        np.testing.assert_array_equal(np.asarray(loaded.covariance),
                                      np.asarray(obs.covariance))

    def test_correlated_observation_roundtrip(self, rng, tmp_path):
        a = rng.normal(size=(6, 6))
        cov = a @ a.T + 6 * np.eye(6)
        obs = Observation(rng.normal(size=(1, 6)), cov, correlated=True)
        path = str(tmp_path / "obs_corr.h5")
        save_observation(path, obs)
        loaded = load_observation(path)
        assert loaded.correlated and loaded.valid

    def test_sharded_weights_roundtrip(self, rng, tmp_path):
        w = jnp.asarray(rng.normal(size=(16, 4, 4)))
        path = str(tmp_path / "orbax_ckpt")
        save_weights_sharded(path, w)
        loaded = load_weights_sharded(path)
        np.testing.assert_array_equal(np.asarray(loaded), np.asarray(w))

    def test_sharded_weights_restore_into_sharding(self, rng, tmp_path):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_assim.parallel.mesh import make_grid_mesh

        w = jnp.asarray(rng.normal(size=(16, 4, 4)))
        path = str(tmp_path / "orbax_sharded")
        save_weights_sharded(path, w)
        mesh = make_grid_mesh(8)
        sharding = NamedSharding(mesh, P("grid", None, None))
        loaded = load_weights_sharded(path, sharding=sharding)
        np.testing.assert_array_equal(np.asarray(loaded), np.asarray(w))
        assert loaded.sharding == sharding


class TestCoordHelpers:
    def test_times_to_seconds_datetime(self):
        t = np.array(["1970-01-01T00:00:10", "1970-01-01T01:00:00"],
                     dtype="datetime64[s]")
        np.testing.assert_allclose(times_to_seconds(t), [10.0, 3600.0])

    def test_times_to_seconds_float_passthrough(self):
        np.testing.assert_allclose(times_to_seconds([1.0, 2.5]), [1.0, 2.5])

    def test_index_to_array_1d(self):
        out = index_to_array(np.array([3, 1, 2]))
        assert out.shape == (3, 1)
        np.testing.assert_allclose(out[:, 0], [3.0, 1.0, 2.0])

    def test_multiindex_to_array(self):
        pd = pytest.importorskip("pandas")
        idx = pd.MultiIndex.from_product(
            [[0.0, 1.0], [10.0, 20.0, 30.0]], names=["a", "b"]
        )
        out = multiindex_to_array(idx)
        assert out.shape == (6, 2)
        np.testing.assert_allclose(out[4], [1.0, 20.0])
        # index_to_array dispatches MultiIndex automatically
        np.testing.assert_allclose(index_to_array(idx), out)

    def test_index_to_array_datetime_index(self):
        pd = pytest.importorskip("pandas")
        idx = pd.Index(np.array(["1970-01-01T00:00:05"],
                                dtype="datetime64[s]"))
        np.testing.assert_allclose(index_to_array(idx), [[5.0]])
