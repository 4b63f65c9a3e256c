"""Tests for tpu_assim.ops.linalg (reference oracle:
/root/reference/pytassim/core/utils.py and tests/unit_tests/core/test_utils)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_assim.ops.linalg import (
    evd,
    rev_evd,
    svd,
    rev_svd,
    matrix_product,
    diagonal_add,
    inv_sqrt_psd_newton,
)


def random_spd(rng, n, batch=()):
    a = rng.randn(*batch, n, n)
    return a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(n)


def test_evd_roundtrip(rng):
    mat = random_spd(rng, 6)
    evals, evects, evals_inv = evd(jnp.asarray(mat), 0.0)
    recomposed = rev_evd(evals, evects)
    np.testing.assert_allclose(np.asarray(recomposed), mat, atol=1e-10)
    np.testing.assert_allclose(np.asarray(evals_inv), 1 / np.asarray(evals))


def test_evd_regularization(rng):
    mat = random_spd(rng, 5)
    reg = 2.5
    evals_noreg, _, _ = evd(jnp.asarray(mat), 0.0)
    evals_reg, _, _ = evd(jnp.asarray(mat), reg)
    np.testing.assert_allclose(
        np.asarray(evals_reg), np.asarray(evals_noreg) + reg, atol=1e-10
    )


def test_evd_clamps_negative_eigenvalues(rng):
    # nearest-PSD semantics: negative eigenvalues clamp to zero before reg
    # (reference: core/utils.py:58)
    mat = np.diag([1.0, -2.0, 3.0])
    evals, _, _ = evd(jnp.asarray(mat), 0.0)
    assert np.all(np.asarray(evals) >= 0)


def test_evd_batched(rng):
    mats = random_spd(rng, 4, batch=(7,))
    evals, evects, _ = evd(jnp.asarray(mats), 1.0)
    rec = rev_evd(evals - 1.0, evects)
    np.testing.assert_allclose(np.asarray(rec), mats, atol=1e-9)


def test_svd_roundtrip(rng):
    mat = rng.randn(5, 5)
    u, s, v = svd(jnp.asarray(mat))
    rec = rev_svd(u, s, v)
    np.testing.assert_allclose(np.asarray(rec), mat, atol=1e-10)


def test_svd_regularization(rng):
    mat = rng.randn(4, 4)
    _, s0, _ = svd(jnp.asarray(mat), 0.0)
    _, s1, _ = svd(jnp.asarray(mat), 0.7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0) + 0.7, atol=1e-12)


def test_matrix_product(rng):
    x = rng.randn(3, 5)
    y = rng.randn(4, 5)
    out = matrix_product(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), x @ y.T, atol=1e-12)


def test_matrix_product_batched(rng):
    x = rng.randn(6, 3, 5)
    y = rng.randn(6, 4, 5)
    out = matrix_product(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), x @ np.swapaxes(y, -1, -2),
                               atol=1e-12)


def test_diagonal_add(rng):
    mat = rng.randn(4, 4)
    out = diagonal_add(jnp.asarray(mat), 3.0)
    np.testing.assert_allclose(np.asarray(out), mat + 3.0 * np.eye(4),
                               atol=1e-12)


def test_inv_sqrt_newton_matches_eigh(rng):
    mats = random_spd(rng, 8, batch=(5,))
    a_inv, a_inv_sqrt = inv_sqrt_psd_newton(jnp.asarray(mats), num_iters=20)
    ref_inv = np.linalg.inv(mats)
    np.testing.assert_allclose(np.asarray(a_inv), ref_inv, atol=1e-8)
    # a_inv_sqrt @ a_inv_sqrt == a_inv
    sq = np.asarray(a_inv_sqrt) @ np.asarray(a_inv_sqrt)
    np.testing.assert_allclose(sq, ref_inv, atol=1e-8)
