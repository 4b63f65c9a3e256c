"""
Differentiable-DA tests (reference genre 5: weights backprop to inputs and to
``inf_factor`` as an ``nn.Parameter``, tests/unit_tests/core/test_etkf.py:
105-126; learnable NN kernel, testing/dummy.py:154 DummyNeuralModule).

In the rebuild the whole analysis is a pure jittable function, so gradients
flow end-to-end: through the eigendecomposition, the localization taper, the
kernel Gram, and the weight application.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_assim.ops.etkf import etkf_weights, letkf_weights_dense
from tpu_assim.ops.ketkf import ketkf_weights
from tpu_assim.ops.kernels import GaussKernel, ModuleKernel


@pytest.fixture
def obs_space(rng):
    perts = jnp.asarray(rng.normal(size=(10, 25)))
    perts = perts - perts.mean(axis=0, keepdims=True)
    innov = jnp.asarray(rng.normal(size=(1, 25)))
    return perts, innov


class TestGradientsThroughCores:
    def test_grad_to_inputs(self, obs_space):
        perts, innov = obs_space

        def loss(p, i):
            return jnp.sum(etkf_weights(p, i, 1.1) ** 2)

        gp, gi = jax.grad(loss, argnums=(0, 1))(perts, innov)
        assert np.isfinite(np.asarray(gp)).all()
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gp).max()) > 0

    def test_grad_to_inf_factor(self, obs_space):
        """The reference trains inf_factor as an nn.Parameter
        (test_etkf.py:105-126); here it is a traced scalar argument."""
        perts, innov = obs_space

        def loss(rho):
            w = etkf_weights(perts, innov, rho)
            return jnp.sum(w ** 2)

        g = jax.grad(loss)(jnp.asarray(1.1))
        assert np.isfinite(float(g)) and float(g) != 0.0

    def test_inf_factor_gradient_descent_recovers_target(self, obs_space):
        """A few gradient steps on rho reduce a weight-matching loss — the
        'learnable inflation' workflow end-to-end."""
        perts, innov = obs_space
        target = etkf_weights(perts, innov, 1.5)

        def loss(rho):
            return jnp.mean((etkf_weights(perts, innov, rho) - target) ** 2)

        rho = jnp.asarray(1.0)
        val0 = float(loss(rho))
        g_fn = jax.jit(jax.grad(loss))
        for _ in range(200):
            rho = rho - 20.0 * g_fn(rho)
        assert float(loss(rho)) < 0.05 * val0
        assert abs(float(rho) - 1.5) < 0.1

    def test_grad_through_localized_solve(self, rng, obs_space):
        perts, innov = obs_space
        obs_w = jnp.asarray(rng.uniform(size=(7, 25)))

        def loss(w_loc):
            return jnp.sum(
                letkf_weights_dense(perts, innov[0], w_loc, 1.1) ** 2
            )

        g = jax.grad(loss)(obs_w)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_grad_through_full_analysis(self, rng):
        """d(analysis)/d(background state) through taper + solve + apply."""
        from tpu_assim.analysis import make_letkf_analysis
        from tpu_assim.ops.localization import GaspariCohn

        ens, g_pts, o = 8, 32, 12
        state = jnp.asarray(rng.normal(size=(ens, g_pts)))
        obs_idx = jnp.asarray(np.arange(0, g_pts, g_pts // o)[:o],
                              dtype=jnp.int32)
        obs_vals = jnp.asarray(rng.normal(size=o))
        obs_var = jnp.full((o,), 0.5)
        grid_coords = jnp.asarray(np.arange(g_pts, dtype=float))[:, None]
        obs_coords = grid_coords[obs_idx]

        def dist(gc, oi):
            return jnp.abs(oi[:, 1] - gc[1])[None, :]

        # method="newton": the matmul-only solve is smooth everywhere,
        # while eigh's VJP divides by eigenvalue gaps and NaNs on the
        # rank-deficient (degenerate-spectrum) Gram matrices localization
        # produces — torch.symeig's backward has the identical failure mode,
        # so the reference could not differentiate this case either.
        analyse = make_letkf_analysis(GaspariCohn((4.0,), dist), 1.1,
                                      method="newton")

        def loss(s):
            out = analyse(s, obs_vals, obs_var, obs_idx, grid_coords,
                          obs_coords)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(state)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_newton_grad_matches_eigh_grad_full_rank(self, rng):
        """On a full-rank Gram (obs > ens, all weights positive) the two
        solvers' gradients agree."""
        from tpu_assim.ops.etkf import letkf_weights_dense

        perts = jnp.asarray(rng.normal(size=(6, 30)))
        innov = jnp.asarray(rng.normal(size=30))
        obs_w = jnp.asarray(rng.uniform(0.2, 1.0, size=(4, 30)))

        def loss(method):
            def inner(w_loc):
                return jnp.sum(letkf_weights_dense(
                    perts, innov, w_loc, 1.1, method=method,
                    newton_iters=40) ** 2)
            return inner

        g_eigh = jax.grad(loss("eigh"))(obs_w)
        g_newton = jax.grad(loss("newton"))(obs_w)
        np.testing.assert_allclose(np.asarray(g_newton), np.asarray(g_eigh),
                                   rtol=1e-6, atol=1e-8)


class TestLearnableKernel:
    def test_module_kernel_trains(self, rng, obs_space):
        """Gradient descent on a linear feature map inside the KETKF solve
        (the DummyNeuralModule workflow, reference testing/dummy.py:154)."""
        perts, innov = obs_space
        target = ketkf_weights(perts, innov, GaussKernel(1.5), 1.1)

        def loss(w_mat):
            kernel = ModuleKernel(lambda v: jnp.tanh(v @ w_mat))
            w = ketkf_weights(perts, innov, kernel, 1.1)
            return jnp.mean((w - target) ** 2)

        w_mat = jnp.asarray(rng.normal(size=(25, 8)) * 0.1)
        val0 = float(loss(w_mat))
        g_fn = jax.jit(jax.grad(loss))
        for _ in range(40):
            w_mat = w_mat - 0.5 * g_fn(w_mat)
        assert float(loss(w_mat)) < 0.7 * val0

    def test_grad_to_kernel_hyperparameter(self, obs_space):
        perts, innov = obs_space

        def loss(ls):
            w = ketkf_weights(perts, innov, GaussKernel(ls), 1.1)
            return jnp.sum(w ** 2)

        g = jax.grad(loss)(jnp.asarray(2.0))
        assert np.isfinite(float(g)) and float(g) != 0.0
