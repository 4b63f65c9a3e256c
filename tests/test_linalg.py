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


class TestJacobiEigh:
    """Pallas parallel-Jacobi batched symeig (interpret mode) vs
    jnp.linalg.eigh — the TPU replacement for the reference's LAPACK call
    (pytassim/core/utils.py:57). 1e-10-level parity in f64; the eigenvector
    contract is checked by recomposition and orthogonality (column signs are
    arbitrary in both)."""

    def test_f64_parity(self, rng):
        from tpu_assim.ops.pallas.jacobi import eigh_jacobi

        for k, b in [(8, 5), (40, 3), (13, 4)]:
            z = rng.randn(b, k, max(k // 2, 3))
            a = jnp.asarray(np.einsum("bki,bmi->bkm", z, z)
                            + np.eye(k) * 2.0)
            ev, evec = eigh_jacobi(a, sweeps=10, tile=8, interpret=True)
            ref_ev, _ = jnp.linalg.eigh(a)
            np.testing.assert_allclose(np.asarray(ev), np.asarray(ref_ev),
                                       rtol=1e-10, atol=1e-10)
            rec = jnp.einsum("bik,bk,bjk->bij", evec, ev, evec)
            np.testing.assert_allclose(np.asarray(rec), np.asarray(a),
                                       rtol=1e-10, atol=1e-10)
            orth = jnp.einsum("bki,bkj->bij", evec, evec)
            np.testing.assert_allclose(
                np.asarray(orth), np.broadcast_to(np.eye(k), (b, k, k)),
                atol=1e-10,
            )

    def test_degenerate_spectrum(self, rng):
        """Rank-deficient Grams (the localized-solve case): repeated zero
        and clustered eigenvalues converge cleanly (the symmetrized-pair
        rotation keeps G orthogonal when entries decay to the asymmetry
        level)."""
        from tpu_assim.ops.pallas.jacobi import eigh_jacobi

        k, b, r = 10, 4, 3
        z = rng.randn(b, k, r)
        a = jnp.asarray(np.einsum("bki,bmi->bkm", z, z))  # rank 3, 7 zeros
        ev, evec = eigh_jacobi(a, sweeps=12, tile=8, interpret=True)
        ref_ev, _ = jnp.linalg.eigh(a)
        np.testing.assert_allclose(np.asarray(ev), np.asarray(ref_ev),
                                   rtol=1e-9, atol=1e-9)
        rec = jnp.einsum("bik,bk,bjk->bij", evec, ev, evec)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(a),
                                   atol=1e-9)

    def test_multi_batch_dims_and_ordering(self, rng):
        from tpu_assim.ops.pallas.jacobi import eigh_jacobi

        z = rng.randn(2, 3, 6, 4)
        a = jnp.asarray(np.einsum("cbki,cbmi->cbkm", z, z) + np.eye(6))
        ev, evec = eigh_jacobi(a, sweeps=10, tile=8, interpret=True)
        assert ev.shape == (2, 3, 6) and evec.shape == (2, 3, 6, 6)
        assert bool(jnp.all(jnp.diff(ev, axis=-1) >= -1e-12))  # ascending
