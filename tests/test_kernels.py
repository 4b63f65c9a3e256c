"""
Kernel-family unit tests (reference intent: tests/unit_tests/kernels/) —
math properties, composition operators, pytree behavior, and KETKF plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_assim.ops.kernels import (
    DiagKernel,
    GaussKernel,
    LinearKernel,
    ModuleKernel,
    OrnsteinUhlenbeckKernel,
    PeriodicKernel,
    PolyKernel,
    RationalKernel,
    RBFKernel,
    ScaleKernel,
    TanhKernel,
)


@pytest.fixture
def xy(rng):
    return (jnp.asarray(rng.normal(size=(10, 25))),
            jnp.asarray(rng.normal(size=(7, 25))))


class TestKernelMath:
    def test_linear_is_dot(self, xy):
        x, y = xy
        np.testing.assert_allclose(
            np.asarray(LinearKernel()(x, y)), np.asarray(x) @ np.asarray(y).T,
            rtol=1e-12,
        )

    def test_gauss_diag_one(self, xy):
        x, _ = xy
        gram = np.asarray(GaussKernel(lengthscale=1.5)(x, x))
        np.testing.assert_allclose(np.diag(gram), 1.0, rtol=1e-6)
        assert (gram <= 1.0 + 1e-6).all()

    def test_gauss_psd(self, xy):
        x, _ = xy
        gram = np.asarray(GaussKernel()(x, x))
        evals = np.linalg.eigvalsh(gram)
        assert evals.min() > -1e-8

    def test_rbf_matches_gauss_reparam(self, xy):
        x, y = xy
        gamma = 0.125
        ls = (0.5 / gamma) ** 0.5
        np.testing.assert_allclose(
            np.asarray(RBFKernel(gamma=gamma)(x, y)),
            np.asarray(GaussKernel(lengthscale=ls)(x, y)), rtol=1e-6,
        )

    def test_poly_degree_one_is_affine_linear(self, xy):
        x, y = xy
        np.testing.assert_allclose(
            np.asarray(PolyKernel(degree=1.0, const=2.0)(x, y)),
            np.asarray(LinearKernel()(x, y)) + 2.0, rtol=1e-9,
        )

    def test_periodic_periodicity(self):
        p = 3.0
        k = PeriodicKernel(period=p, lengthscale=1.0)
        x = jnp.asarray([[0.5]])
        y = jnp.asarray([[0.5 + 2 * p]])
        np.testing.assert_allclose(np.asarray(k(x, y)), 1.0, atol=1e-5)

    def test_rational_limits_to_gauss(self, xy):
        """a -> inf: rational-quadratic converges to the Gauss kernel."""
        x, y = xy
        rq = np.asarray(RationalKernel(lengthscale=2.0, weighting=1e6)(x, y))
        gs = np.asarray(GaussKernel(lengthscale=2.0)(x, y))
        np.testing.assert_allclose(rq, gs, rtol=1e-3)

    def test_ou_one_at_zero_distance(self, xy):
        x, _ = xy
        gram = np.asarray(OrnsteinUhlenbeckKernel(lengthscale=2.0)(x, x))
        np.testing.assert_allclose(np.diag(gram), 1.0, rtol=1e-6)

    def test_scale_constant(self, xy):
        x, y = xy
        np.testing.assert_allclose(np.asarray(ScaleKernel(0.7)(x, y)), 0.7,
                                   rtol=1e-6)

    def test_diag_identity_and_mismatch(self, xy):
        x, y = xy
        same = np.asarray(DiagKernel(2.0)(x, x))
        np.testing.assert_allclose(same, 2.0 * np.eye(10), atol=1e-12)
        diff = np.asarray(DiagKernel(2.0)(x, y))
        np.testing.assert_allclose(diff, 0.0, atol=1e-12)

    def test_tanh_bounded(self, xy):
        x, y = xy
        out = np.asarray(TanhKernel(coeff=0.3, const=0.0)(x, y))
        assert (np.abs(out) <= 1.0).all()

    def test_module_kernel_feature_map(self, xy, rng):
        x, y = xy
        w = jnp.asarray(rng.normal(size=(25, 4)))
        k = ModuleKernel(lambda v: v @ w)
        np.testing.assert_allclose(
            np.asarray(k(x, y)),
            (np.asarray(x) @ np.asarray(w)) @ (np.asarray(y)
                                               @ np.asarray(w)).T,
            rtol=1e-9,
        )


class TestKernelComposition:
    def test_add(self, xy):
        x, y = xy
        k = GaussKernel(1.0) + ScaleKernel(0.5)
        np.testing.assert_allclose(
            np.asarray(k(x, y)),
            np.asarray(GaussKernel(1.0)(x, y)) + 0.5, rtol=1e-6,
        )

    def test_mul(self, xy):
        x, y = xy
        k = LinearKernel() * LinearKernel()
        np.testing.assert_allclose(
            np.asarray(k(x, y)), np.asarray(LinearKernel()(x, y)) ** 2,
            rtol=1e-9,
        )

    def test_pow(self, xy):
        x, y = xy
        k = GaussKernel(2.0) ** ScaleKernel(2.0)
        np.testing.assert_allclose(
            np.asarray(k(x, y)), np.asarray(GaussKernel(2.0)(x, y)) ** 2.0,
            rtol=1e-5,
        )

    def test_nested_composition(self, xy):
        x, y = xy
        k = (GaussKernel(1.0) + LinearKernel()) * ScaleKernel(2.0)
        expected = (np.asarray(GaussKernel(1.0)(x, y))
                    + np.asarray(LinearKernel()(x, y))) * 2.0
        np.testing.assert_allclose(np.asarray(k(x, y)), expected, rtol=1e-5)


class TestKernelPytree:
    def test_kernel_params_are_leaves(self):
        k = GaussKernel(lengthscale=2.0)
        leaves = jax.tree_util.tree_leaves(k)
        assert any(np.asarray(l) == 2.0 for l in leaves)

    def test_grad_through_kernel_param(self, xy):
        x, y = xy

        def loss(ls):
            return jnp.sum(GaussKernel(lengthscale=ls)(x, y))

        g = jax.grad(loss)(jnp.asarray(2.0))
        assert np.isfinite(float(g)) and float(g) != 0.0

    def test_jit_with_kernel_arg(self, xy):
        x, y = xy

        @jax.jit
        def gram(k, a, b):
            return k(a, b)

        out = gram(GaussKernel(1.5), x, y)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(GaussKernel(1.5)(x, y)),
                                   rtol=1e-7)
