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
