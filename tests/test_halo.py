"""
Obs-sharded halo-exchange LETKF vs the replicated-obs path.

The TPU analog of the reference's dask chunked-vs-unchunked parity oracle
(/root/reference/tests/unit_tests/interface/test_letkf.py and
test_ienks.py:188-200, rtol=atol=1e-10): the halo-sharded analysis over an
8-device mesh must reproduce the single-program dense analysis exactly, for
any halo width that covers the taper support.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_assim.analysis import make_letkf_analysis
from tpu_assim.ops.localization import GaspariCohn
from tpu_assim.parallel.mesh import make_grid_mesh
from tpu_assim.parallel.halo import (
    halo_letkf_analysis,
    halo_width_for,
    shard_observations,
)

TOL = dict(rtol=1e-10, atol=1e-10)


def _dist_fn(grid_coord, obs_info):
    return jnp.abs(obs_info[:, 1] - grid_coord[1])[None, :]


def _workload(rng, ens_size=10, n_grid=128, n_obs=48):
    state = rng.normal(size=(ens_size, n_grid))
    obs_idx = np.sort(rng.choice(n_grid, size=n_obs, replace=False))
    obs_vals = rng.normal(size=n_obs)
    obs_var = rng.uniform(0.3, 1.5, size=n_obs)
    grid_coords = np.arange(n_grid, dtype=np.float64)[:, None]
    obs_coords = grid_coords[obs_idx]
    return state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords


class TestHaloLETKF:
    @pytest.mark.parametrize("radius", [4.0, 7.0])
    def test_matches_dense_analysis(self, rng, radius):
        state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = _workload(
            rng
        )
        n_grid = state.shape[1]
        loc = GaspariCohn((radius,), _dist_fn)

        dense = make_letkf_analysis(loc, inf_factor=1.1)
        expected = dense(
            jnp.asarray(state), jnp.asarray(obs_vals), jnp.asarray(obs_var),
            jnp.asarray(obs_idx), jnp.asarray(grid_coords),
            jnp.asarray(obs_coords),
        )

        mesh = make_grid_mesh(8)
        shard_span = n_grid / 8
        h = halo_width_for(radius, shard_span)
        vals, var, lidx, coords, valid, _ = shard_observations(
            obs_vals, obs_var, obs_idx, obs_coords, n_grid, 8
        )
        analyse = halo_letkf_analysis(
            mesh, loc, max_obs=32, halo_width=h, inf_factor=1.1
        )
        result = analyse(
            jnp.asarray(state), jnp.asarray(vals), jnp.asarray(var),
            jnp.asarray(lidx), jnp.asarray(coords), jnp.asarray(valid),
            jnp.asarray(grid_coords),
        )
        np.testing.assert_allclose(np.asarray(result), np.asarray(expected),
                                   **TOL)

    def test_halo_width_bound(self):
        # cutoff 2r = 8, shard span 16 -> one neighbor is enough
        assert halo_width_for(4.0, 16.0) == 1
        # cutoff 40, shard span 16 -> three neighbors
        assert halo_width_for(20.0, 16.0) == 3

    def test_obs_bucketing_roundtrip(self, rng):
        _, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = _workload(
            rng
        )
        vals, var, lidx, coords, valid, p = shard_observations(
            obs_vals, obs_var, obs_idx, obs_coords, 128, 8
        )
        assert vals.shape == (8 * p,)
        # every real observation is present exactly once with its variance
        got = sorted(vals[valid > 0].tolist())
        assert np.allclose(got, sorted(obs_vals.tolist()))
        # local indices point inside the shard block
        assert (lidx >= 0).all() and (lidx < 128 // 8).all()

    def test_wider_halo_is_identical(self, rng):
        """Extra halo width must not change the result (wrapped candidates
        get taper weight exactly 0)."""
        state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = _workload(
            rng
        )
        loc = GaspariCohn((4.0,), _dist_fn)
        mesh = make_grid_mesh(8)
        vals, var, lidx, coords, valid, _ = shard_observations(
            obs_vals, obs_var, obs_idx, obs_coords, 128, 8
        )
        args = (
            jnp.asarray(state), jnp.asarray(vals), jnp.asarray(var),
            jnp.asarray(lidx), jnp.asarray(coords), jnp.asarray(valid),
            jnp.asarray(grid_coords),
        )
        a1 = halo_letkf_analysis(mesh, loc, max_obs=32, halo_width=1,
                                 inf_factor=1.1)(*args)
        a2 = halo_letkf_analysis(mesh, loc, max_obs=32, halo_width=2,
                                 inf_factor=1.1)(*args)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), **TOL)


class TestHaloChebKernel:
    def test_halo_pallas_matches_eigh_path(self, rng, monkeypatch):
        """The fused cheb kernel inside shard_map reproduces the eigh halo
        path (f32 kernel => loose tolerance)."""
        import tpu_assim.ops.pallas.letkf as pk

        orig = pk.letkf_nbh_analysis_cheb

        def interp(*a, **kw):
            kw["interpret"] = True  # no TPU in the test env
            return orig(*a, **kw)

        monkeypatch.setattr(pk, "letkf_nbh_analysis_cheb", interp)

        state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = _workload(
            rng
        )
        loc = GaspariCohn((4.0,), _dist_fn)
        mesh = make_grid_mesh(4)
        vals, var, lidx, coords, valid, _ = shard_observations(
            obs_vals, obs_var, obs_idx, obs_coords, 128, 4
        )
        args = (
            jnp.asarray(state), jnp.asarray(vals), jnp.asarray(var),
            jnp.asarray(lidx), jnp.asarray(coords), jnp.asarray(valid),
            jnp.asarray(grid_coords),
        )
        a_ref = halo_letkf_analysis(mesh, loc, max_obs=32, halo_width=1,
                                    inf_factor=1.1)(*args)
        a_fused = halo_letkf_analysis(mesh, loc, max_obs=32, halo_width=1,
                                      inf_factor=1.1, use_pallas=True)(*args)
        np.testing.assert_allclose(np.asarray(a_fused), np.asarray(a_ref),
                                   rtol=5e-4, atol=5e-5)


class TestHalo2D:
    """2-D domain decomposition: the (row, col)-tiled halo analysis must
    reproduce the dense single-program analysis exactly."""

    def _workload_2d(self, rng, ens=8, n_rows=16, n_cols=24, n_obs=60):
        state2d = rng.normal(size=(ens, n_rows, n_cols))
        flat_choices = rng.choice(n_rows * n_cols, size=n_obs, replace=False)
        obs_ij = np.stack(
            [flat_choices // n_cols, flat_choices % n_cols], axis=1
        ).astype(np.int32)
        obs_vals = rng.normal(size=n_obs)
        obs_var = rng.uniform(0.4, 1.2, size=n_obs)
        rr, cc = np.meshgrid(np.arange(n_rows, dtype=float),
                             np.arange(n_cols, dtype=float), indexing="ij")
        grid_coords = np.stack([rr, cc], axis=-1)           # [R, C, 2]
        obs_coords = grid_coords[obs_ij[:, 0], obs_ij[:, 1]]  # [o, 2]
        return state2d, obs_vals, obs_var, obs_ij, grid_coords, obs_coords

    @staticmethod
    def _dist2d(gc, oi):
        # per-dimension |dr|, |dc| distances (columns 1,2 of the info rows)
        return jnp.abs(oi[:, 1:3] - gc[1:3][None, :]).T

    def test_2d_matches_dense(self, rng):
        from jax.sharding import Mesh
        from tpu_assim.parallel.halo import (
            halo_letkf_analysis_2d, shard_observations_2d)

        ens, n_rows, n_cols = 8, 16, 24
        (state2d, obs_vals, obs_var, obs_ij, grid_coords,
         obs_coords) = self._workload_2d(rng, ens, n_rows, n_cols)
        radius = 3.0
        loc = GaspariCohn((radius,), self._dist2d)

        # dense reference on the flattened grid
        flat_idx = (obs_ij[:, 0] * n_cols + obs_ij[:, 1]).astype(np.int32)
        dense = make_letkf_analysis(loc, inf_factor=1.1)
        expected = dense(
            jnp.asarray(state2d.reshape(ens, -1)), jnp.asarray(obs_vals),
            jnp.asarray(obs_var), jnp.asarray(flat_idx),
            jnp.asarray(grid_coords.reshape(-1, 2)), jnp.asarray(obs_coords),
        )

        mesh_shape = (2, 4)
        devices = np.asarray(jax.devices()[:8]).reshape(mesh_shape)
        mesh = Mesh(devices, ("row", "col"))
        vals, var, lidx, coords, valid, _ = shard_observations_2d(
            obs_vals, obs_var, obs_ij, obs_coords,
            (n_rows, n_cols), mesh_shape,
        )
        # tile spans: 8 rows, 6 cols; cutoff 2r=6 -> 1 tile halo each axis
        analyse = halo_letkf_analysis_2d(
            mesh, loc, max_obs=32, grid_shape=(n_rows, n_cols),
            halo=(1, 1), inf_factor=1.1,
        )
        result = analyse(
            jnp.asarray(state2d), jnp.asarray(vals), jnp.asarray(var),
            jnp.asarray(lidx), jnp.asarray(coords), jnp.asarray(valid),
            jnp.asarray(grid_coords),
        )
        np.testing.assert_allclose(
            np.asarray(result).reshape(ens, -1), np.asarray(expected), **TOL
        )

    def test_2d_obs_bucketing(self, rng):
        from tpu_assim.parallel.halo import shard_observations_2d

        (_, obs_vals, obs_var, obs_ij, _, obs_coords) = self._workload_2d(rng)
        vals, var, lidx, coords, valid, p = shard_observations_2d(
            obs_vals, obs_var, obs_ij, obs_coords, (16, 24), (2, 4))
        assert vals.shape == (8 * p,)
        got = sorted(vals[valid > 0].tolist())
        assert np.allclose(got, sorted(obs_vals.tolist()))
        assert (lidx >= 0).all() and (lidx < 8 * 6).all()
