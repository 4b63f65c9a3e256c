"""Sharded-vs-single-device parity tests — the TPU-native analog of the
reference's dask chunked-vs-unchunked oracle
(/root/reference/tests/unit_tests/interface/test_etkf.py:109,
test_ienks.py:188-200): the sharded SPMD program must reproduce the
single-device analysis to allclose 1e-10."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_assim.ops.etkf import letkf_weights_dense
from tpu_assim.ops.localization import GaspariCohn
from tpu_assim.parallel import (
    make_grid_mesh,
    make_forecast_analysis_mesh,
    shard_state,
    sharded_letkf_weights,
    sharded_letkf_analysis,
)
from tpu_assim.testing import dummy_distance
from tpu_assim.state import EnsembleState


@pytest.fixture
def mesh():
    assert len(jax.devices()) >= 8, "tests need the 8-device CPU mesh"
    return make_grid_mesh(8)


@pytest.fixture
def problem(rng):
    k, l, g, d = 10, 24, 64, 2
    perts = jnp.asarray(rng.randn(k, l))
    innov = jnp.asarray(rng.randn(l))
    grid_info = jnp.asarray(
        np.hstack([np.zeros((g, 1)), np.arange(g)[:, None].astype(float)])
    )
    obs_info = jnp.asarray(
        np.hstack(
            [np.zeros((l, 1)), rng.uniform(0, g, size=(l, 1))]
        )
    )
    return perts, innov, grid_info, obs_info


def test_sharded_weights_match_local(mesh, problem):
    perts, innov, grid_info, obs_info = problem
    loc = GaspariCohn((8.0,), dummy_distance)
    w_loc = loc.taper_weights(grid_info, obs_info)
    expected = letkf_weights_dense(perts, innov, w_loc, 1.1)
    sharded = sharded_letkf_weights(
        mesh, loc, perts, innov, grid_info, obs_info, 1.1
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), atol=1e-10, rtol=1e-10
    )


def test_sharded_weights_no_localization(mesh, problem):
    perts, innov, grid_info, obs_info = problem
    w_loc = jnp.ones((grid_info.shape[0], innov.shape[0]))
    expected = letkf_weights_dense(perts, innov, w_loc, 1.0)
    sharded = sharded_letkf_weights(
        mesh, None, perts, innov, grid_info, obs_info, 1.0
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), atol=1e-10, rtol=1e-10
    )


def test_sharded_analysis_matches_local(mesh, problem, rng):
    perts, innov, grid_info, obs_info = problem
    g = grid_info.shape[0]
    loc = GaspariCohn((8.0,), dummy_distance)
    state_data = jnp.asarray(rng.randn(2, 1, 10, g))

    # local oracle
    w_loc = loc.taper_weights(grid_info, obs_info)
    weights = letkf_weights_dense(perts, innov, w_loc, 1.1)
    mean = jnp.mean(state_data, axis=2, keepdims=True)
    sp = state_data - mean
    expected = mean + jnp.einsum("vtkg,gkm->vtmg", sp, weights)

    analysis = sharded_letkf_analysis(
        mesh, loc, state_data, perts, innov, grid_info, obs_info, 1.1
    )
    np.testing.assert_allclose(
        np.asarray(analysis), np.asarray(expected), atol=1e-10, rtol=1e-10
    )


def test_sharded_analysis_with_chunking(mesh, problem, rng):
    perts, innov, grid_info, obs_info = problem
    g = grid_info.shape[0]
    loc = GaspariCohn((8.0,), dummy_distance)
    state_data = jnp.asarray(rng.randn(1, 1, 10, g))
    full = sharded_letkf_analysis(
        mesh, loc, state_data, perts, innov, grid_info, obs_info, 1.0,
        chunksize=None,
    )
    chunked = sharded_letkf_analysis(
        mesh, loc, state_data, perts, innov, grid_info, obs_info, 1.0,
        chunksize=3,
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), atol=1e-10, rtol=1e-10
    )


def test_shard_state_roundtrip(mesh, rng):
    state = EnsembleState(
        jnp.asarray(rng.randn(1, 1, 4, 16)),
        grid_coords=jnp.arange(16.0)[:, None],
    )
    sharded = shard_state(state, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.data), np.asarray(state.data)
    )
    assert sharded.valid


def test_2d_mesh_construction():
    mesh = make_forecast_analysis_mesh(2, 4)
    assert mesh.shape == {"ens": 2, "grid": 4}
