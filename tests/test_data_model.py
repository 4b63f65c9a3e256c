"""
Data-model contract tests (reference genre 6: exhaustive accessor-validity
tests, tests/unit_tests/test_model_state.py and test_obs_subset.py:57-341).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_assim.observation import Observation, ObservationError
from tpu_assim.state import EnsembleState, StateError


class TestEnsembleStateContract:
    def test_requires_4d(self, rng):
        with pytest.raises(StateError):
            EnsembleState(rng.normal(size=(3, 5, 8)))

    def test_valid_default_coords(self, rng):
        s = EnsembleState(rng.normal(size=(2, 3, 5, 8)))
        assert s.valid
        assert s.times.shape == (3,)
        assert s.grid_coords.shape == (8, 1)
        assert s.var_names == (0, 1)
        assert s.ens_members == (0, 1, 2, 3, 4)

    def test_invalid_on_mismatched_coords(self, rng):
        s = EnsembleState(rng.normal(size=(2, 3, 5, 8)))
        bad = s.replace(times=jnp.asarray([0.0]))
        assert not bad.valid

    def test_split_mean_perts(self, rng):
        s = EnsembleState(rng.normal(size=(1, 1, 5, 8)))
        mean, perts = s.split_mean_perts()
        np.testing.assert_allclose(np.asarray(mean + perts),
                                   np.asarray(s.data), atol=1e-12)
        np.testing.assert_allclose(np.asarray(perts.mean(axis=2)), 0.0,
                                   atol=1e-12)

    def test_pytree_roundtrip(self, rng):
        s = EnsembleState(rng.normal(size=(1, 2, 3, 4)), var_names=("x",))
        leaves, treedef = jax.tree_util.tree_flatten(s)
        s2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert s2.var_names == ("x",)
        np.testing.assert_array_equal(np.asarray(s2.data),
                                      np.asarray(s.data))

    def test_jit_through_state(self, rng):
        s = EnsembleState(rng.normal(size=(1, 2, 3, 4)))

        @jax.jit
        def double(state):
            return state.replace(data=state.data * 2)

        out = double(s)
        np.testing.assert_allclose(np.asarray(out.data),
                                   2 * np.asarray(s.data), atol=1e-12)

    def test_arithmetic(self, rng):
        s = EnsembleState(rng.normal(size=(1, 1, 2, 3)))
        np.testing.assert_allclose(np.asarray((s + 1.0).data),
                                   np.asarray(s.data) + 1.0)
        np.testing.assert_allclose(np.asarray((2.0 * s).data),
                                   2.0 * np.asarray(s.data))
        np.testing.assert_allclose(np.asarray((s - s).data), 0.0, atol=1e-12)

    def test_time_selection(self, rng):
        s = EnsembleState(rng.normal(size=(1, 4, 2, 3)),
                          times=np.array([0.0, 1.0, 2.0, 3.0]))
        assert s.time_index(None) == 3
        assert s.time_index(1.2) == 1
        sel = s.sel_time_index(2)
        assert sel.n_times == 1
        np.testing.assert_array_equal(np.asarray(sel.times), [2.0])

    def test_grid_info_prepends_time(self, rng):
        s = EnsembleState(rng.normal(size=(1, 2, 2, 5)),
                          times=np.array([7.0, 8.0]))
        info = s.grid_info()
        assert info.shape == (5, 2)
        np.testing.assert_allclose(np.asarray(info[:, 0]), 7.0)


class TestObservationContract:
    def test_diagonal_valid(self, rng):
        obs = Observation(rng.normal(size=(2, 6)), np.ones(6))
        assert obs.valid and not obs.correlated

    def test_time_dependent_diagonal(self, rng):
        obs = Observation(rng.normal(size=(2, 6)),
                          rng.uniform(0.5, 1.5, size=(2, 6)))
        assert obs.valid and not obs.correlated and obs.time_dependent_cov

    def test_correlated_inferred_from_3d(self, rng):
        cov = np.stack([np.eye(6)] * 2)
        obs = Observation(rng.normal(size=(2, 6)), cov)
        assert obs.valid and obs.correlated and obs.time_dependent_cov

    def test_square_ambiguity_defaults_uncorrelated(self, rng):
        # [time=6, obs=6] square diagonal covariance: ambiguous, defaults to
        # uncorrelated unless told otherwise
        obs = Observation(rng.normal(size=(6, 6)), np.ones((6, 6)))
        assert not obs.correlated
        obs_c = Observation(rng.normal(size=(6, 6)), np.eye(6),
                            correlated=True)
        assert obs_c.correlated and obs_c.valid

    def test_invalid_shapes(self, rng):
        obs = Observation(rng.normal(size=(2, 6)), np.ones(5))
        assert not obs.valid

    def test_uncorrelated_rcinv(self, rng):
        var = rng.uniform(0.5, 2.0, size=6)
        obs = Observation(rng.normal(size=(1, 6)), var)
        val = jnp.asarray(rng.normal(size=(1, 6)))
        np.testing.assert_allclose(
            np.asarray(obs.mul_rcinv(val)),
            np.asarray(val) / np.sqrt(var), rtol=1e-12,
        )

    def test_correlated_rcinv_whitens(self, rng):
        """R^{-1/2}-normalized perturbations of N(0, R) samples have unit
        sample covariance (the purpose of the normalization,
        reference: observation.py:247-271)."""
        n, n_samples = 4, 200000
        a = rng.normal(size=(n, n))
        cov = a @ a.T + n * np.eye(n)
        obs = Observation(rng.normal(size=(1, n)), cov, correlated=True)
        chol = np.linalg.cholesky(cov)
        samples = rng.normal(size=(n_samples, n)) @ chol.T
        white = np.asarray(obs.mul_rcinv(jnp.asarray(samples)))
        sample_cov = white.T @ white / n_samples
        np.testing.assert_allclose(sample_cov, np.eye(n), atol=0.02)

    def test_correlated_time_dependent_rcinv(self, rng):
        n = 3
        covs = []
        for _ in range(2):
            a = rng.normal(size=(n, n))
            covs.append(a @ a.T + n * np.eye(n))
        cov = np.stack(covs)
        obs = Observation(rng.normal(size=(2, n)), cov, correlated=True)
        val = jnp.asarray(rng.normal(size=(2, n)))
        out = np.asarray(obs.mul_rcinv(val))
        for t in range(2):
            chol = np.linalg.cholesky(covs[t])
            expected = np.linalg.solve(chol, np.asarray(val[t]))
            np.testing.assert_allclose(out[t], expected, rtol=1e-9,
                                       atol=1e-10)

    def test_sel_time(self, rng):
        obs = Observation(rng.normal(size=(3, 4)),
                          rng.uniform(1, 2, size=(3, 4)),
                          times=np.array([0.0, 5.0, 10.0]))
        sub = obs.sel_time(5.0)
        assert sub.n_times == 1
        np.testing.assert_array_equal(np.asarray(sub.times), [5.0])
        with pytest.raises(KeyError):
            obs.sel_time(7.0)

    def test_stacked_coords_layout(self, rng):
        obs = Observation(
            rng.normal(size=(2, 3)), np.ones(3),
            obs_coords=np.array([[10.0], [20.0], [30.0]]),
            times=np.array([100.0, 200.0]),
        )
        info = np.asarray(obs.stacked_coords())
        assert info.shape == (6, 2)
        np.testing.assert_allclose(info[:, 0], [100] * 3 + [200] * 3)
        np.testing.assert_allclose(info[:, 1], [10, 20, 30, 10, 20, 30])


class TestValidationContract:
    """Accessor-validity corners mirroring the reference's exhaustive
    obs-subset checks (/root/reference/tests/unit_tests/test_obs_subset.py:
    57-341) on this data model."""

    def _state(self, rng, n_var=1, n_time=2, n_ens=5, n_grid=8):
        return EnsembleState(
            jnp.asarray(rng.randn(n_var, n_time, n_ens, n_grid)),
            times=jnp.arange(n_time, dtype=jnp.float64),
        )

    def test_assimilate_rejects_non_state(self, rng):
        from tpu_assim import ETKF

        obs = Observation(jnp.zeros((1, 4)), jnp.ones(4))
        with pytest.raises(TypeError):
            ETKF().assimilate("not a state", obs)

    def test_assimilate_rejects_invalid_state(self, rng):
        from tpu_assim import ETKF
        from tpu_assim.state import StateError

        st = self._state(rng)
        st.times = jnp.arange(5, dtype=jnp.float64)  # wrong length
        obs = Observation(jnp.zeros((2, 4)), jnp.ones(4))
        with pytest.raises(StateError):
            ETKF().assimilate(st, obs)

    def test_assimilate_rejects_invalid_obs(self, rng):
        from tpu_assim import ETKF
        from tpu_assim.observation import ObservationError

        st = self._state(rng)
        obs = Observation(jnp.zeros((2, 4)), jnp.ones(4))
        obs.covariance = jnp.ones(7)  # wrong obs length
        with pytest.raises(ObservationError):
            ETKF().assimilate(st, obs)

    def test_valid_checks_time_dependent_diag_shape(self, rng):
        obs = Observation(jnp.zeros((2, 4)), jnp.ones((2, 4)))
        assert obs.valid
        obs.covariance = jnp.ones((3, 4))  # wrong time length
        assert not obs.valid

    def test_valid_checks_time_dependent_corr_shape(self, rng):
        obs = Observation(jnp.zeros((2, 4)), jnp.broadcast_to(
            jnp.eye(4), (2, 4, 4)))
        assert obs.correlated and obs.valid
        obs.covariance = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
        assert not obs.valid

    def test_valid_checks_coords_and_times(self, rng):
        obs = Observation(jnp.zeros((2, 4)), jnp.ones(4))
        obs.obs_coords = jnp.zeros((5, 1))
        assert not obs.valid
        obs = Observation(jnp.zeros((2, 4)), jnp.ones(4))
        obs.times = jnp.zeros(3)
        assert not obs.valid

    def test_explicit_correlated_flag_on_square(self, rng):
        """The ambiguous [time, obs] == [obs, obs] square defaults to
        uncorrelated; correlated=True selects the Cholesky route."""
        n = 4
        a = rng.randn(n, n) * 0.1
        cov = a @ a.T + np.eye(n)
        obs_u = Observation(jnp.zeros((n, n)), jnp.asarray(cov))
        obs_c = Observation(jnp.zeros((n, n)), jnp.asarray(cov),
                            correlated=True)
        assert not obs_u.correlated and obs_c.correlated
        v = jnp.asarray(rng.randn(n, n))
        out_u = obs_u.mul_rcinv(v)
        out_c = obs_c.mul_rcinv(v)
        np.testing.assert_allclose(np.asarray(out_u),
                                   np.asarray(v) / np.sqrt(cov), atol=1e-12)
        chol = np.linalg.cholesky(cov)
        np.testing.assert_allclose(
            np.asarray(out_c),
            np.linalg.solve(chol, np.asarray(v).T).T, atol=1e-10)

    def test_rcinv_ens_perts_layout(self, rng):
        """mul_rcinv broadcasts over leading (ensemble) dims with obs last
        — the [ens, time, obs] perturbation layout the interface feeds it
        (reference obs-last contract, observation.py:241-271)."""
        t, o, k = 2, 5, 3
        var = rng.uniform(0.5, 2.0, size=(t, o))
        obs = Observation(jnp.zeros((t, o)), jnp.asarray(var))
        perts = jnp.asarray(rng.randn(k, t, o))
        out = obs.mul_rcinv(perts)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(perts) / np.sqrt(var), atol=1e-12)

    def test_sel_time_tolerant_match(self, rng):
        """Times differing only by float rounding still pair up (the
        analysis time is chosen by nearest state time)."""
        times = np.array([0.0, 3600.0, 7200.0])
        obs = Observation(jnp.zeros((3, 4)), jnp.ones(4),
                          times=jnp.asarray(times))
        picked = obs.sel_time(3600.0 * (1 + 1e-15))
        assert float(picked.times[0]) == 3600.0
        with pytest.raises(KeyError):
            obs.sel_time(1800.0)

    def test_operatorless_obs_dropped(self, rng):
        """Observations without an operator are silently skipped, matching
        the reference's NotImplementedError catch (base.py:180-220)."""
        from tpu_assim import ETKF
        from tpu_assim.testing import dummy_obs_operator

        st = self._state(rng, n_grid=8)

        def broken_operator(obs, pseudo_state):
            raise NotImplementedError

        good = Observation(
            jnp.asarray(rng.randn(2, 8)), jnp.ones(8),
            obs_coords=st.grid_coords, times=st.times,
            operator=dummy_obs_operator())
        no_op = Observation(jnp.zeros((2, 8)), jnp.ones(8),
                            obs_coords=st.grid_coords, times=st.times)
        broken = no_op.replace(operator=broken_operator)
        etkf = ETKF(inf_factor=1.1)
        only_good = etkf.assimilate(st, [good])
        with_others = etkf.assimilate(st, [good, no_op, broken])
        np.testing.assert_allclose(np.asarray(with_others.data),
                                   np.asarray(only_good.data), atol=1e-12)

    def test_grid_coords_1d_promoted(self, rng):
        st = EnsembleState(jnp.asarray(rng.randn(1, 1, 4, 6)),
                           grid_coords=jnp.arange(6.0))
        assert st.grid_coords.shape == (6, 1)
        obs = Observation(jnp.zeros((1, 6)), jnp.ones(6),
                          obs_coords=jnp.arange(6.0))
        assert obs.obs_coords.shape == (6, 1)
