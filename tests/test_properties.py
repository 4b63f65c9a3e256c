"""
Algorithm-invariant property tests — structural truths of the ensemble
transform that hold for any input, complementing the value-based oracles.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_assim.ops.etkf import etkf_weights, letkf_weights_dense
from tpu_assim.ops.ketkf import ketkf_weights
from tpu_assim.ops.kernels import GaussKernel


@pytest.fixture
def problem(rng):
    k, o = 9, 21
    ens = rng.normal(size=(k, o))
    perts = ens - ens.mean(axis=0, keepdims=True)
    innov = rng.normal(size=(1, o))
    return jnp.asarray(perts), jnp.asarray(innov)


class TestETKFInvariants:
    def test_member_permutation_equivariance(self, rng, problem):
        """Permuting ensemble members permutes the analysis members the same
        way: W(P Z) = P W(Z) P^T for the symmetric square-root filter."""
        perts, innov = problem
        k = perts.shape[0]
        perm = rng.permutation(k)
        w = np.asarray(etkf_weights(perts, innov, 1.1))
        w_p = np.asarray(etkf_weights(perts[jnp.asarray(perm)], innov, 1.1))
        np.testing.assert_allclose(w_p, w[np.ix_(perm, perm)],
                                   rtol=1e-9, atol=1e-10)

    def test_infinite_obs_error_limit(self, problem):
        """Perturbations scaled to ~zero (obs variance -> inf after R^{-1/2}
        normalization) recover the inflated prior sqrt(rho) I."""
        perts, innov = problem
        w = np.asarray(etkf_weights(perts * 1e-9, innov * 1e-9, 1.44))
        np.testing.assert_allclose(w, 1.2 * np.eye(perts.shape[0]),
                                   rtol=1e-6, atol=1e-6)

    def test_spread_contraction(self, problem):
        """Assimilation never inflates the weight-space spread beyond the
        rho-inflated prior: eigenvalues of W'^T W' are <= rho."""
        perts, innov = problem
        rho = 1.1
        # perturbation part = the zero-innovation solve (w_mean = 0)
        wp = np.asarray(etkf_weights(perts, jnp.zeros_like(innov), rho))
        evals = np.linalg.eigvalsh(wp.T @ wp)
        assert evals.max() <= rho + 1e-8

    def test_analysis_mean_depends_only_on_innovation_direction(
        self, problem
    ):
        """Zero innovation => mean weights vanish: W reduces to the
        symmetric square root (columns of W - W' are zero)."""
        perts, innov = problem
        w0 = np.asarray(etkf_weights(perts, jnp.zeros_like(innov), 1.1))
        np.testing.assert_allclose(w0, w0.T, rtol=1e-9, atol=1e-10)

    def test_obs_order_invariance(self, rng, problem):
        """Shuffling the observation order leaves the weights unchanged."""
        perts, innov = problem
        o = perts.shape[1]
        perm = jnp.asarray(rng.permutation(o))
        w = np.asarray(etkf_weights(perts, innov, 1.1))
        w_p = np.asarray(etkf_weights(perts[:, perm], innov[:, perm], 1.1))
        np.testing.assert_allclose(w_p, w, rtol=1e-9, atol=1e-10)


class TestLETKFInvariants:
    def test_obs_weight_scaling_equals_variance_scaling(self, rng, problem):
        """Taper weight w on an obs == scaling that obs's error variance by
        1/w (the Hunt et al. 2007 interpretation the reference implements
        by sqrt(w) scaling, wrapper.py:91-97)."""
        perts, innov = problem
        o = perts.shape[1]
        w_loc = jnp.asarray(rng.uniform(0.1, 1.0, size=(1, o)))
        via_weights = np.asarray(
            letkf_weights_dense(perts, innov[0], w_loc, 1.1)
        )[0]
        sw = jnp.sqrt(w_loc[0])
        via_scaling = np.asarray(
            etkf_weights(perts * sw, innov * sw, 1.1)
        )
        np.testing.assert_allclose(via_weights, via_scaling,
                                   rtol=1e-9, atol=1e-10)


class TestKETKFInvariants:
    def test_kernel_scaling_invariance_of_prior(self, problem):
        """Zero perturbations: KETKF also returns the inflated prior for any
        kernel (the Gram double-centering kills the constant)."""
        perts, innov = problem
        w = np.asarray(ketkf_weights(
            jnp.zeros_like(perts), jnp.zeros_like(innov),
            GaussKernel(2.0), 1.21,
        ))
        np.testing.assert_allclose(w, 1.1 * np.eye(perts.shape[0]),
                                   rtol=1e-6, atol=1e-6)
