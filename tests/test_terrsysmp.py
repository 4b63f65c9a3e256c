"""
TerrSysMP adapters (COSMO / CLM) and the T2m station operator.

Mirrors the reference test intent (tests/unit_tests/model/test_cosmo.py,
test_clm.py, obs_ops/test_cos_t2m.py): preprocess produces a valid stacked
state, postprocess writes the analysis back into the model dataset, and the
station operator reproduces hand-computed nearest-neighbor + lapse-rate
values.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_assim.utils.dataset import Dataset, Variable
from tpu_assim.models.terrsysmp import (
    preprocess_cosmo,
    postprocess_cosmo,
    preprocess_clm,
    postprocess_clm,
)
from tpu_assim.obs_ops.terrsysmp import CosmoT2mOperator, _get_cartesian


def make_cosmo_ds(rng, n_time=2, n_ens=3, n_rlat=4, n_rlon=5):
    vcoord = np.array([10000.0, 7500.0, 5000.0, 2500.0, 0.0])
    soil1 = np.array([0.005, 0.02, 0.06])
    height_2m = np.array([2.0])
    shape_h = (n_time, n_ens, n_rlat, n_rlon)
    data_vars = {
        "T": Variable(
            ("time", "ensemble", "level", "rlat", "rlon"),
            rng.normal(280, 10, size=(n_time, n_ens, 4) + shape_h[2:]),
        ),
        "W": Variable(
            ("time", "ensemble", "level1", "rlat", "rlon"),
            rng.normal(0, 1, size=(n_time, n_ens, 5) + shape_h[2:]),
        ),
        "T_2M": Variable(
            ("time", "ensemble", "height_2m", "rlat", "rlon"),
            rng.normal(285, 5, size=(n_time, n_ens, 1) + shape_h[2:]),
        ),
        "W_SO": Variable(
            ("time", "ensemble", "soil1", "rlat", "rlon"),
            rng.uniform(0, 1, size=(n_time, n_ens, 3) + shape_h[2:]),
        ),
        "vcoord": Variable(("level1",), vcoord),
    }
    coords = {
        "time": np.array([0.0, 3600.0])[:n_time],
        "level1": np.arange(5, dtype=np.float64),
        "level": np.arange(4, dtype=np.float64),
        "soil1": soil1,
        "height_2m": height_2m,
        "rlat": np.linspace(-1.0, 1.0, n_rlat),
        "rlon": np.linspace(-2.0, 2.0, n_rlon),
    }
    return Dataset(data_vars, coords)


ASSIM_VARS = ["T", "W", "T_2M", "W_SO"]


class TestCosmoAdapter:
    def test_preprocess_shapes(self, rng):
        ds = make_cosmo_ds(rng)
        state = preprocess_cosmo(ds, ASSIM_VARS)
        # vgrid = 5 model levels + 3 (negated) soil levels
        assert state.data.shape == (4, 2, 3, 4 * 5 * 8)
        assert state.valid
        assert state.grid_coords.shape == (4 * 5 * 8, 3)
        # soil coordinates are negated into the merged height axis
        assert np.asarray(state.vgrid).min() == pytest.approx(-0.06)

    def test_preprocess_warns_missing_var(self, rng):
        ds = make_cosmo_ds(rng)
        state = preprocess_cosmo(ds, ASSIM_VARS + ["MISSING"])
        assert tuple(state.var_names) == tuple(ASSIM_VARS)

    def test_roundtrip_identity(self, rng):
        """postprocess(preprocess(ds)) == ds when the analysis equals the
        background (the reference's own write-back oracle)."""
        ds = make_cosmo_ds(rng)
        state = preprocess_cosmo(ds, ASSIM_VARS)
        out = postprocess_cosmo(state, ds)
        for var in ASSIM_VARS:
            np.testing.assert_allclose(
                out[var].values, ds[var].values, rtol=1e-12, atol=1e-12,
                err_msg=var,
            )

    def test_postprocess_applies_increment(self, rng):
        ds = make_cosmo_ds(rng)
        state = preprocess_cosmo(ds, ASSIM_VARS)
        incremented = state.replace(data=state.data + 1.5)
        out = postprocess_cosmo(incremented, ds)
        for var in ASSIM_VARS:
            np.testing.assert_allclose(
                out[var].values, ds[var].values + 1.5, rtol=1e-12,
                err_msg=var,
            )
        # non-assimilated variables untouched
        np.testing.assert_array_equal(out["vcoord"].values,
                                      ds["vcoord"].values)


def make_clm_ds(rng, n_time=2, n_ens=2, n_lat=3, n_lon=4):
    levsoi = np.array([0.01, 0.04, 0.1])
    levtot = np.array([1.0, 2.0, 3.0, 4.0])
    data_vars = {
        "H2OSOI": Variable(
            ("time", "ensemble", "levsoi", "lat", "lon"),
            rng.uniform(size=(n_time, n_ens, 3, n_lat, n_lon)),
        ),
        "TSOI": Variable(
            ("time", "ensemble", "levtot", "lat", "lon"),
            rng.normal(275, 5, size=(n_time, n_ens, 4, n_lat, n_lon)),
        ),
        "H2OSNO": Variable(
            ("time", "ensemble", "lat", "lon"),
            rng.uniform(size=(n_time, n_ens, n_lat, n_lon)),
        ),
    }
    coords = {
        "time": np.array([0.0, 1800.0]),
        "levsoi": levsoi,
        "levtot": levtot,
        "lat": np.linspace(50.0, 51.0, n_lat),
        "lon": np.linspace(7.0, 8.0, n_lon),
    }
    return Dataset(data_vars, coords)


CLM_VARS = ["H2OSOI", "TSOI", "H2OSNO"]


class TestClmAdapter:
    def test_preprocess_shapes(self, rng):
        ds = make_clm_ds(rng)
        state = preprocess_clm(ds, CLM_VARS)
        # vgrid = 3 soil + 4 total levels
        assert state.data.shape == (3, 2, 2, 3 * 4 * 7)
        assert state.valid

    def test_roundtrip_identity(self, rng):
        ds = make_clm_ds(rng)
        state = preprocess_clm(ds, CLM_VARS)
        out = postprocess_clm(state, ds)
        for var in CLM_VARS:
            np.testing.assert_allclose(
                out[var].values, ds[var].values, rtol=1e-12, atol=1e-12,
                err_msg=var,
            )


class TestCosmoT2mOperator:
    def _setup(self, rng):
        n_rlat, n_rlon, n_vgrid = 3, 3, 6
        cosmo_lat, cosmo_lon = np.meshgrid(
            np.array([50.0, 50.5, 51.0]), np.array([7.0, 7.5, 8.0]),
            indexing="ij",
        )
        hsurf = rng.uniform(100, 300, size=(n_rlat, n_rlon))
        vgrid = np.array([500.0, 300.0, 100.0, 50.0, 10.0, 0.0])
        # stations exactly on two grid points (plus height offsets)
        st_lat = np.array([50.0, 51.0])
        st_lon = np.array([7.5, 8.0])
        st_alt = hsurf[[0, 2], [1, 2]] + np.array([25.0, -40.0])
        var_names = ("T", "T_2M")
        op = CosmoT2mOperator(
            st_lat, st_lon, st_alt, cosmo_lat, cosmo_lon, hsurf, vgrid,
            var_names, lev_inds=(0, 2), t2m_level=0.0,
        )
        state_data = rng.normal(
            280, 5, size=(2, 2, 4, n_rlat * n_rlon * n_vgrid)
        )
        return op, state_data, hsurf, vgrid, st_alt

    def test_nearest_station_selection(self, rng):
        op, *_ = self._setup(rng)
        # stations sit exactly on flat horizontal cells 0*3+1=1 and 2*3+2=8
        np.testing.assert_array_equal(op.locs, [1, 8])

    def test_height_diff(self, rng):
        op, _, hsurf, _, st_alt = self._setup(rng)
        np.testing.assert_allclose(
            op.height_diff, st_alt - hsurf.reshape(-1)[[1, 8]]
        )

    def test_obs_op_hand_computed(self, rng):
        op, state_data, hsurf, vgrid, st_alt = self._setup(rng)
        out = np.asarray(op.jax_operator()(jnp.asarray(state_data)))
        assert out.shape == (2, 4, 2)
        # hand computation for station 0 / time 1 / member 2
        col = op.locs[0]
        n_vg = len(vgrid)
        t2m_ind = 5  # vgrid value 0.0
        uncorr = state_data[1, 1, 2, col * n_vg + t2m_ind]
        t_lev1 = state_data[0, 1, 2, col * n_vg + 2]
        t_lev0 = state_data[0, 1, 2, col * n_vg + 0]
        lapse = (t_lev1 - t_lev0) / (vgrid[2] - vgrid[0])
        expected = uncorr + op.height_diff[0] * lapse
        np.testing.assert_allclose(out[1, 2, 0], expected, rtol=1e-12)

    def test_cartesian(self):
        xyz = _get_cartesian(
            np.array([0.0, 90.0]), np.array([0.0, 0.0]),
            np.array([0.0, 100.0]),
        )
        np.testing.assert_allclose(xyz[0], [6371000.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(xyz[1, 2], 6371100.0, rtol=1e-12)


class TestEndToEndAssimilation:
    """Full chain: COSMO dataset -> preprocess -> LETKF analysis with the
    T2m station operator -> postprocess back into the model dataset."""

    def test_cosmo_t2m_letkf_roundtrip(self, rng):
        from tpu_assim.interface import LETKF
        from tpu_assim.observation import Observation
        from tpu_assim.ops.localization import GaspariCohn

        ds = make_cosmo_ds(rng, n_time=1, n_ens=8)
        state = preprocess_cosmo(ds, ASSIM_VARS)
        vgrid = np.asarray(state.vgrid)
        n_rlat, n_rlon = 4, 5
        lat2d, lon2d = np.meshgrid(np.linspace(50, 51, n_rlat),
                                   np.linspace(7, 8, n_rlon), indexing="ij")
        hsurf = rng.uniform(100, 200, size=(n_rlat, n_rlon))
        st_lat = np.array([50.0, 51.0])
        st_lon = np.array([7.25, 7.75])
        st_alt = np.array([140.0, 180.0])
        op = CosmoT2mOperator(
            st_lat, st_lon, st_alt, lat2d, lon2d, hsurf, vgrid,
            state.var_names, lev_inds=(0, 2), t2m_level=0.0,
        )

        def operator(obs_ds, pseudo_state):
            return op(obs_ds, pseudo_state)

        obs_vals = rng.normal(285, 2, size=(1, 2))
        # station obs coordinates: (time prepended later, lat, lon); the
        # state's grid_coords are (rlat_idx-coord, rlon, vgrid) from the
        # adapter, so localize on matching columns
        grid_ll = np.asarray(state.grid_coords)
        obs_coords = grid_ll[op.locs * len(vgrid)][:, :2]
        obs = Observation(
            jnp.asarray(obs_vals), jnp.full((2,), 1.0),
            obs_coords=jnp.asarray(obs_coords),
            times=state.times, operator=operator,
        )

        def dist(gc, oi):
            return jnp.abs(oi[:, 1:3] - gc[1:3][None, :]).T

        letkf = LETKF(localization=GaspariCohn((1.5, 2.5), dist),
                      inf_factor=1.05, chunksize=None)
        analysis = letkf.assimilate(state, obs)
        assert analysis.valid
        # the stacked state carries NaN at vgrid-padding slots by design
        # (reindex padding, dropped again by postprocess); the analysis must
        # be finite exactly where the background was
        back_finite = np.isfinite(np.asarray(state.data))
        ana = np.asarray(analysis.data)
        assert np.isfinite(ana[back_finite]).all()
        assert np.isnan(ana[~back_finite]).all()
        # write the analysis back into a model dataset
        out_ds = postprocess_cosmo(analysis, ds)
        for var in ASSIM_VARS:
            assert np.isfinite(out_ds[var].values).all()
        # the update actually changed the observed field
        assert not np.allclose(out_ds["T_2M"].values, ds["T_2M"].values)
