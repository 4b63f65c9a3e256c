"""
Observation operators (reference intent: tests/unit_tests/obs_ops/).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_assim.obs_ops import IdentityOperator, BernoulliOperator
from tpu_assim.observation import Observation
from tpu_assim.state import EnsembleState


@pytest.fixture
def state(rng):
    return EnsembleState(
        rng.normal(size=(2, 3, 5, 40)),
        times=np.array([0.0, 1.0, 2.0]),
        var_names=("x", "y"),
    )


class TestIdentityOperator:
    def test_observe_all(self, state):
        op = IdentityOperator(len_grid=40)
        out = op.obs_op(state)
        assert out.shape == (3, 5, 40)
        # selects variable 'x' (reference: identity.py:80-82)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(state.data[0]))

    def test_observe_list(self, state):
        op = IdentityOperator(obs_points=[3, 7, 11], len_grid=40)
        out = op.obs_op(state)
        assert out.shape == (3, 5, 3)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(state.data[0][..., [3, 7, 11]])
        )

    def test_observe_random_draw(self, state):
        op = IdentityOperator(obs_points=10, len_grid=40,
                              random_state=np.random.RandomState(42))
        assert len(op._sel_obs_points) == 10
        assert (np.diff(op._sel_obs_points) > 0).all()  # sorted, unique
        out = op.obs_op(state)
        assert out.shape == (3, 5, 10)

    def test_jax_operator_matches_obs_op(self, state):
        op = IdentityOperator(obs_points=[0, 5], len_grid=40)
        fn = op.jax_operator()
        np.testing.assert_allclose(
            np.asarray(fn(state.data[0])), np.asarray(op.obs_op(state)),
            atol=1e-12,
        )

    def test_jax_operator_differentiable(self, rng):
        op = IdentityOperator(obs_points=[1, 2], len_grid=8)
        fn = op.jax_operator()
        g = jax.grad(lambda x: jnp.sum(fn(x)))(jnp.asarray(rng.normal(size=8)))
        expected = np.zeros(8)
        expected[[1, 2]] = 1.0
        np.testing.assert_allclose(np.asarray(g), expected, atol=1e-12)

    def test_call_aligns_obs_times(self, state, rng):
        op = IdentityOperator(obs_points=[0, 1], len_grid=40)
        obs = Observation(
            rng.normal(size=(2, 2)), np.ones(2), times=np.array([2.0, 0.0]),
        )
        out = op(obs, state)
        assert out.shape == (2, 5, 2)
        # first row = state time 2.0 (index 2), second = time 0.0 (index 0)
        np.testing.assert_array_equal(
            np.asarray(out[0]), np.asarray(state.data[0, 2][:, [0, 1]])
        )
        np.testing.assert_array_equal(
            np.asarray(out[1]), np.asarray(state.data[0, 0][:, [0, 1]])
        )

    def test_call_missing_time_raises(self, state, rng):
        op = IdentityOperator(len_grid=40)
        obs = Observation(rng.normal(size=(1, 40)), np.ones(40),
                          times=np.array([99.0]))
        with pytest.raises(KeyError):
            op(obs, state)


class TestBernoulliOperator:
    def test_sigmoid_of_identity(self, state):
        op = BernoulliOperator(shift=5.0, obs_points=[0, 1, 2], len_grid=40)
        ident = IdentityOperator(obs_points=[0, 1, 2], len_grid=40)
        expected = 1.0 / (1.0 + np.exp(-(np.asarray(ident.obs_op(state))
                                         - 5.0)))
        np.testing.assert_allclose(np.asarray(op.obs_op(state)), expected,
                                   rtol=1e-6)

    def test_jax_operator_matches(self, state):
        op = BernoulliOperator(shift=2.0, obs_points=[4, 9], len_grid=40)
        fn = op.jax_operator()
        np.testing.assert_allclose(
            np.asarray(fn(state.data[0])), np.asarray(op.obs_op(state)),
            atol=1e-7,
        )

    def test_range(self, state):
        op = BernoulliOperator(shift=0.0, len_grid=40)
        out = np.asarray(op.obs_op(state))
        assert ((out > 0) & (out < 1)).all()
