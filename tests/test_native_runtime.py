"""
Native C++ runtime vs the JAX path and vs numpy.

The C++ solver (native/letkf_cpu.cpp, cyclic Jacobi eigensolver) and the
JAX eigh path implement the same reference math
(pytassim/core/etkf.py:57-77); both must agree to near machine precision.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_assim.ops.etkf import etkf_weights, letkf_weights_dense
from tpu_assim.runtime import (
    bucket_obs_cpu,
    etkf_weights_cpu,
    gaspari_cohn_cpu,
    letkf_weights_dense_cpu,
    native_available,
)

TOL = dict(rtol=1e-9, atol=1e-11)


def test_native_builds():
    """g++ is in the image; the native library must actually build."""
    assert native_available()


class TestNativeSolvers:
    def test_etkf_weights(self, rng):
        perts = rng.normal(size=(10, 25))
        perts -= perts.mean(axis=0, keepdims=True)
        innov = rng.normal(size=25)
        ours = etkf_weights_cpu(perts, innov, 1.1)
        expected = etkf_weights(jnp.asarray(perts), jnp.asarray(innov), 1.1)
        np.testing.assert_allclose(ours, np.asarray(expected), **TOL)

    def test_letkf_weights_dense(self, rng):
        k, o, g = 8, 30, 17
        perts = rng.normal(size=(k, o))
        perts -= perts.mean(axis=0, keepdims=True)
        innov = rng.normal(size=o)
        obs_w = np.where(rng.uniform(size=(g, o)) < 0.4, 0.0,
                         rng.uniform(0.1, 1.0, size=(g, o)))
        ours = letkf_weights_dense_cpu(perts, innov, obs_w, 1.2)
        expected = letkf_weights_dense(
            jnp.asarray(perts), jnp.asarray(innov), jnp.asarray(obs_w), 1.2
        )
        np.testing.assert_allclose(ours, np.asarray(expected), **TOL)

    def test_all_zero_weights_column(self, rng):
        """A column with all-zero obs weights degenerates to the inflated
        prior sqrt(rho) I (reference empty-obs path, core/etkf.py:91-95)."""
        k, o = 6, 12
        perts = rng.normal(size=(k, o))
        innov = rng.normal(size=o)
        obs_w = np.zeros((1, o))
        out = letkf_weights_dense_cpu(perts, innov, obs_w, 1.44)
        np.testing.assert_allclose(out[0], 1.2 * np.eye(k), rtol=1e-12,
                                   atol=1e-12)


class TestInputPath:
    def test_bucket_obs(self, rng):
        n_grid, n_shards = 128, 8
        obs_idx = rng.choice(n_grid, size=50, replace=True).astype(np.int32)
        order, counts, maxc = bucket_obs_cpu(obs_idx, n_grid, n_shards)
        assert counts.sum() == 50
        assert maxc == counts.max()
        # order groups obs by owner, stably
        owner_sorted = (obs_idx[order] // (n_grid // n_shards))
        assert (np.diff(owner_sorted) >= 0).all()
        assert sorted(order.tolist()) == list(range(50))

    def test_gaspari_cohn_matches_jax(self, rng):
        from tpu_assim.ops.localization import GaspariCohn

        grid = rng.uniform(0, 100, size=40)
        obs = rng.uniform(0, 100, size=30)
        native = gaspari_cohn_cpu(grid, obs, radius=10.0)

        def dist(gc, oi):
            return jnp.abs(oi[:, 0] - gc[0])[None, :]

        loc = GaspariCohn((10.0,), dist)
        expected = loc.taper_weights(
            jnp.asarray(grid)[:, None], jnp.asarray(obs)[:, None]
        )
        np.testing.assert_allclose(native, np.asarray(expected),
                                   rtol=1e-12, atol=1e-12)
