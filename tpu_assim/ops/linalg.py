"""
Batched linear-algebra helpers for the analysis cores.

Functional JAX equivalents of the reference's torch helpers
(/root/reference/pytassim/core/utils.py:26-199), generalized to arbitrary
leading batch dimensions so that millions of per-gridpoint K x K solves run as
one batched XLA op on the MXU instead of a Python loop.

All recompositions are einsums so XLA can fuse scaling into the matmuls.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "evd",
    "rev_evd",
    "svd",
    "rev_svd",
    "matrix_product",
    "diagonal_add",
    "eigh_psd",
    "set_jacobi_dispatch",
    "jacobi_dispatch_enabled",
    "inv_and_inv_sqrt_psd_eigh",
    "inv_sqrt_psd_newton",
    "sqrt_and_inv_sqrt_psd_newton",
    "inv_spd_newton",
]


def evd(
    tensor: jnp.ndarray, reg_value: jnp.ndarray | float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of a symmetric PSD tensor with regularization.

    Mirrors the reference semantics (pytassim/core/utils.py:26-61): the
    eigenvalues of the nearest positive semidefinite matrix are used
    (clamp at 0), then ``reg_value`` is added and inverted eigenvalues are
    returned alongside.

    Parameters
    ----------
    tensor : [..., n, n] symmetric tensor.
    reg_value : scalar added to the (clamped) eigenvalues.

    Returns
    -------
    evals, evects, evals_inv : ([..., n], [..., n, n], [..., n])
    """
    evals, evects = eigh_psd(tensor)
    evals = jnp.clip(evals, 0.0, None)
    evals = evals + reg_value
    evals_inv = 1.0 / evals
    return evals, evects, evals_inv


def rev_evd(evals: jnp.ndarray, evects: jnp.ndarray) -> jnp.ndarray:
    """Recompose ``U diag(evals) U^T`` (pytassim/core/utils.py:64-93)."""
    return jnp.einsum("...ik,...k,...jk->...ij", evects, evals, evects,
                      precision=jax.lax.Precision.HIGHEST)


@jax.custom_vjp
def _svd_jacobi_diff(tensor: jnp.ndarray):
    from tpu_assim.ops.pallas.svd import svd_jacobi

    return svd_jacobi(tensor)


def _svd_jacobi_fwd(tensor):
    out = _svd_jacobi_diff(tensor)
    return out, out


def _svd_jacobi_bwd(res, cot):
    # Standard square-SVD pullback expressed in the FORWARD's own
    # (u, s, v) — valid for any sign/order convention, so the Pallas
    # kernel's outputs (signs arbitrary, like LAPACK's) feed it directly:
    #   dA = U [ (F o sk(U^T dU)) S + S (F o sk(V^T dV)) + diag(ds) ] V^T
    # with F_ij = 1/(s_j^2 - s_i^2) and sk(X) = X - X^T. Exactly repeated
    # singular values zero-guard F (the gradient of any
    # rotation-invariant composition stays correct; per-vector gradients
    # are non-unique there for LAPACK too).
    u, s, v = res
    du, ds, dv = cot
    hp = jax.lax.Precision.HIGHEST
    s2 = s * s
    den = s2[..., None, :] - s2[..., :, None]
    f = jnp.where(den != 0.0, 1.0 / jnp.where(den == 0.0, 1.0, den), 0.0)

    def sk(x):
        return x - jnp.swapaxes(x, -1, -2)

    k = s.shape[-1]
    inner = jnp.zeros(s.shape[:-1] + (k, k), s.dtype)
    if type(du) is not jax.interpreters.ad.Zero:
        utdu = jnp.einsum("...ki,...kj->...ij", u, du, precision=hp)
        inner = inner + (f * sk(utdu)) * s[..., None, :]
    if type(dv) is not jax.interpreters.ad.Zero:
        vtdv = jnp.einsum("...ki,...kj->...ij", v, dv, precision=hp)
        inner = inner + s[..., :, None] * (f * sk(vtdv))
    if type(ds) is not jax.interpreters.ad.Zero:
        inner = inner + ds[..., :, None] * jnp.eye(k, dtype=s.dtype)
    da = jnp.einsum("...ik,...kl,...jl->...ij", u, inner, v, precision=hp)
    return (da,)


_svd_jacobi_diff.defvjp(_svd_jacobi_fwd, _svd_jacobi_bwd)


def svd(
    tensor: jnp.ndarray,
    reg_value: jnp.ndarray | float = 0.0,
    use_jacobi: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reduced SVD with additive regularization of the singular values.

    Matches torch.svd conventions used by the reference
    (pytassim/core/utils.py:96-124): returns ``v`` (not ``v^T``) such that
    ``tensor = u diag(s) v^T``.

    Dispatch: large square f32 [B, K, K] batches on TPU go to the Pallas
    one-sided Jacobi kernel by default
    (:func:`tpu_assim.ops.pallas.svd.svd_jacobi`) — the IEnKS inner loops
    run two such SVDs per grid column and XLA's batched svd at that shape
    is even slower than its batched eigh (scripts/validate_svd.py). The
    dispatch follows the same gate and controls as :func:`eigh_psd`
    (``use_jacobi`` / :func:`set_jacobi_dispatch` / ``TPU_ASSIM_JACOBI``);
    everything else stays on ``jnp.linalg.svd``. The Jacobi path is
    differentiable via a custom pullback in its own outputs.
    """
    if use_jacobi is None:
        use_jacobi = jacobi_dispatch_enabled()
    k = tensor.shape[-1]
    batch = 1
    for dim in tensor.shape[:-2]:
        batch *= dim
    if (
        use_jacobi
        and tensor.dtype == jnp.float32
        and tensor.ndim >= 3
        and tensor.shape[-2] == k
        and k <= 64
        and batch >= 256
        and jax.default_backend() == "tpu"
    ):
        u, s, v = _svd_jacobi_diff(tensor)
    else:
        u, s, vh = jnp.linalg.svd(tensor, full_matrices=False)
        v = jnp.swapaxes(vh, -1, -2)
    s = s + reg_value
    return u, s, v


def rev_svd(u: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Recompose ``u diag(s) v^T`` (pytassim/core/utils.py:127-150)."""
    return jnp.einsum("...ik,...k,...jk->...ij", u, s, v,
                      precision=jax.lax.Precision.HIGHEST)


def matrix_product(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """``x @ y^T`` over the trailing two dims (pytassim/core/utils.py:153-173).

    Full f32 precision on TPU: Gram matrices feed matrix inversions, where
    the default bf16 MXU passes cost ~3 digits in the final weights.
    """
    return jnp.einsum("...kl,...ml->...km", x, y,
                      precision=jax.lax.Precision.HIGHEST)


def diagonal_add(tensor: jnp.ndarray, to_add: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Add a scalar to the diagonal of the trailing two dims
    (pytassim/core/utils.py:176-199)."""
    n = tensor.shape[-1]
    eye = jnp.eye(n, dtype=tensor.dtype)
    return tensor + to_add * eye


_jacobi_dispatch: Optional[bool] = None  # None = take the env-var default


def set_jacobi_dispatch(enabled: Optional[bool]) -> None:
    """Set the process-wide default for the Pallas-Jacobi eigh dispatch.

    ``True``/``False`` force the dispatch on/off for subsequent *traces*;
    ``None`` restores the environment default (``TPU_ASSIM_JACOBI``, on
    unless set to ``"0"``). Functions that were already jit-compiled keep
    the backend they were traced with — call sites that need per-call
    control should pass ``use_jacobi=`` to :func:`eigh_psd` explicitly and
    thread it through their jit as a static argument.
    """
    global _jacobi_dispatch
    _jacobi_dispatch = enabled


def jacobi_dispatch_enabled() -> bool:
    """Resolve the current default for the Pallas-Jacobi dispatch
    (explicit :func:`set_jacobi_dispatch` value, else ``TPU_ASSIM_JACOBI``)."""
    import os

    if _jacobi_dispatch is not None:
        return _jacobi_dispatch
    return os.environ.get("TPU_ASSIM_JACOBI", "1") != "0"


def eigh_psd(
    tensor: jnp.ndarray, use_jacobi: Optional[bool] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigendecomposition.

    Same convention as :func:`jnp.linalg.eigh` (ascending eigenvalues,
    eigenvector columns — the reference's ``torch.symeig(..., upper=False)``,
    pytassim/core/utils.py:57).

    Dispatch: large f32 [B, K, K] batches on TPU go to a Pallas Jacobi
    kernel by DEFAULT — since round 5 the ONE-SIDED Hestenes kernel
    (:func:`tpu_assim.ops.pallas.svd.eigh_svd_jacobi`: eigenvectors = V of
    the SVD, eigenvalues sign-recovered from diag(U^T V)), whose
    transposed carry keeps every per-round op on the cheap untiled axis:
    115 ms at [10^4, 40, 40] f32 random SPD on v5e vs 212 ms for the
    two-sided :func:`~tpu_assim.ops.pallas.jacobi.eigh_jacobi` and ~1.0 s
    for XLA's batched eigh (8.5x), at equal or better compiled-f32
    quality — orthogonality ~1e-5, reconstruction 2.6e-5 relative incl. a
    24-fold degenerate cluster (scripts/validate_eigh_svd.py; the
    two-sided kernel remains available via
    ``TPU_ASSIM_EIGH_KERNEL=twosided``). Everything else (f64 parity
    paths on CPU, tiny batches, K > 64) stays on ``jnp.linalg.eigh``.

    One-sided caveat: a symmetric matrix with an EXACT +lambda/-lambda
    magnitude tie has a degenerate singular subspace, where V may mix the
    two eigendirections — impossible for the PSD inputs this function is
    for (see :func:`eigh_svd_jacobi`); pass
    ``TPU_ASSIM_EIGH_KERNEL=twosided`` for indefinite spectra with
    magnitude ties.

    ``use_jacobi`` controls the dispatch explicitly (a *static*, trace-time
    choice — the backends are different compiled programs); ``None``
    defers to :func:`set_jacobi_dispatch` / the ``TPU_ASSIM_JACOBI`` env
    var. Note that flipping the env vars after a caller has been
    jit-compiled cannot retroactively change that caller's backend.
    """
    if use_jacobi is None:
        use_jacobi = jacobi_dispatch_enabled()
    k = tensor.shape[-1]
    batch = 1
    for dim in tensor.shape[:-2]:
        batch *= dim
    if (
        use_jacobi
        and tensor.dtype == jnp.float32
        and tensor.ndim >= 3
        and k <= 64
        and batch >= 256
        and jax.default_backend() == "tpu"
    ):
        import os

        if os.environ.get("TPU_ASSIM_EIGH_KERNEL", "onesided") == "twosided":
            from tpu_assim.ops.pallas.jacobi import eigh_jacobi

            return eigh_jacobi(tensor)
        from tpu_assim.ops.pallas.svd import eigh_svd_jacobi

        return eigh_svd_jacobi(tensor)
    return jnp.linalg.eigh(tensor)


@jax.custom_jvp
def inv_and_inv_sqrt_psd_eigh(
    g_mat: jnp.ndarray, reg: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``((Gc + reg I)^{-1}, (Gc + reg I)^{-1/2})`` of a batched symmetric
    PSD matrix via one eigendecomposition, ``Gc`` the eigenvalue-clamped
    (nearest-PSD) input — the reference's regularized solve
    (pytassim/core/utils.py:26-93 composed as in core/etkf.py:57-77).

    Differentiation note: ``jnp.linalg.eigh``'s VJP divides by eigenvalue
    gaps and NaNs on the degenerate spectra that localized (rank-deficient)
    Gram matrices always have — torch.symeig's backward fails identically,
    so the reference cannot differentiate this case either. The *composed*
    matrix functions are nonetheless smooth in ``G``; this function carries
    the exact Daleckii–Krein JVP (divided differences of the eigenvalue
    maps, derivative on degenerate pairs), making the eigh path
    differentiable everywhere the underlying map is — gradients match the
    matmul-only ``method='newton'`` path (tests/test_differentiable.py).
    """
    evals, evects = eigh_psd(g_mat)
    h = jnp.clip(evals, 0.0, None) + reg
    return rev_evd(1.0 / h, evects), rev_evd(1.0 / jnp.sqrt(h), evects)


@inv_and_inv_sqrt_psd_eigh.defjvp
def _inv_and_inv_sqrt_psd_eigh_jvp(primals, tangents):
    g_mat, reg = primals
    dg, dreg = tangents
    evals, evects = eigh_psd(g_mat)
    dtype = evals.dtype
    eps = jnp.finfo(dtype).eps
    scale = jnp.max(jnp.abs(evals), axis=-1, keepdims=True) + jnp.abs(reg)
    # clamp derivative: active above rounding-level negatives (an exactly
    # PSD matrix perturbed along PSD-preserving directions keeps h' = 1 at
    # eigenvalue 0 — the choice that matches the Newton path and finite
    # differences on the PSD manifold)
    act = (evals > -1e3 * eps * scale).astype(dtype)
    h = jnp.clip(evals, 0.0, None) + reg
    f1 = 1.0 / h
    f2 = 1.0 / jnp.sqrt(h)
    d1 = -act * f1 * f1
    d2 = -0.5 * act * f2 * f1
    out1 = rev_evd(f1, evects)
    out2 = rev_evd(f2, evects)

    hp = jax.lax.Precision.HIGHEST
    m = jnp.einsum("...ki,...kl,...lj->...ij", evects, dg, evects,
                   precision=hp)
    m = 0.5 * (m + jnp.swapaxes(m, -1, -2))
    den = evals[..., :, None] - evals[..., None, :]
    # switch to the derivative mean below sqrt(eps)-relative gaps: both the
    # correct degenerate limit AND the numerically stable branch (the
    # divided difference cancels catastrophically for tiny gaps)
    close = jnp.abs(den) <= jnp.sqrt(eps) * scale[..., None]
    den_safe = jnp.where(close, 1.0, den)

    def matfun_tangent(f, d):
        gamma = jnp.where(
            close,
            0.5 * (d[..., :, None] + d[..., None, :]),
            (f[..., :, None] - f[..., None, :]) / den_safe,
        )
        return jnp.einsum("...ik,...kl,...jl->...ij", evects, gamma * m,
                          evects, precision=hp)

    dreg = jnp.asarray(dreg, dtype)
    dout1 = matfun_tangent(f1, d1) + dreg * rev_evd(-f1 * f1, evects)
    dout2 = matfun_tangent(f2, d2) + dreg * rev_evd(-0.5 * f2 * f1, evects)
    return (out1, out2), (dout1, dout2)


@partial(jax.jit, static_argnames=("num_iters",))
def inv_sqrt_psd_newton(
    a: jnp.ndarray, num_iters: int = 14, lam_min: Optional[float] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Matmul-only inverse and inverse-square-root of a batched SPD matrix.

    Coupled Denman–Beavers/Newton–Schulz iteration: for SPD ``A`` scaled to
    spectral radius < 2, iterate ``Y <- Y (3I - Z Y)/2``, ``Z <- (3I - Z Y)/2 Z``
    which converges to ``Y = A^{-1/2}``, ``Z = A^{1/2}`` (up to the scale
    factor). Every step is a batched K x K matmul, i.e. pure MXU work — the
    fast alternative to eigendecomposition for the LETKF hot path. Exposed as
    an opt-in solver; the default path uses :func:`evd` for exact parity with
    the reference math.

    Parameters
    ----------
    lam_min : optional known lower bound on the spectrum (for the ETKF solve
        this is exactly the regularizer ``(K-1)/rho``). With it the input is
        scaled by ``2 / (lam_min + lam_max_bound)``, centering the spectrum
        about 1 — the optimal affine scaling, which cuts the linear warm-up
        phase of the iteration roughly in half for well-conditioned inputs.

    Returns ``(a_inv, a_inv_sqrt)``.
    """
    k = a.shape[-1]
    eye = jnp.eye(k, dtype=a.dtype)
    # Spectral-radius upper bound: min(row-sum/infinity norm, trace) — both
    # valid for SPD matrices, cheap, and batched.
    inf_norm = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)
    trace = jnp.trace(a, axis1=-2, axis2=-1)
    lam_max = jnp.minimum(inf_norm, trace)[..., None, None]
    if lam_min is not None:
        norm = 0.5 * (lam_max + jnp.asarray(lam_min, a.dtype))
    else:
        norm = lam_max
    norm = jnp.maximum(norm, jnp.finfo(a.dtype).tiny)
    a_n = a / norm

    # Full-precision matmuls: the iteration amplifies rounding, and the
    # TPU default (bf16 MXU passes for f32 operands) loses ~3 digits over
    # ~20 iterations. HIGHEST keeps the MXU path but accumulates in f32.
    hp = jax.lax.Precision.HIGHEST

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - jnp.einsum("...ij,...jk->...ik", z, y,
                                          precision=hp))
        y = jnp.einsum("...ij,...jk->...ik", y, t, precision=hp)
        z = jnp.einsum("...ij,...jk->...ik", t, z, precision=hp)
        return y, z

    y0 = a_n
    z0 = jnp.broadcast_to(eye, a.shape)
    y, z = jax.lax.fori_loop(0, num_iters, body, (y0, z0))
    # y -> a_n^{1/2}, z -> a_n^{-1/2}
    sqrt_norm = jnp.sqrt(norm)
    a_inv_sqrt = z / sqrt_norm
    a_inv = jnp.einsum("...ij,...jk->...ik", a_inv_sqrt, a_inv_sqrt,
                       precision=hp)
    return a_inv, a_inv_sqrt


@partial(jax.jit, static_argnames=("num_iters",))
def sqrt_and_inv_sqrt_psd_newton(
    a: jnp.ndarray, num_iters: int = 14, lam_min: Optional[float] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coupled Newton–Schulz returning ``(a_sqrt, a_inv_sqrt)`` — the same
    iteration as :func:`inv_sqrt_psd_newton` exposing the square-root factor
    instead of the inverse."""
    k = a.shape[-1]
    eye = jnp.eye(k, dtype=a.dtype)
    inf_norm = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)
    trace = jnp.trace(a, axis1=-2, axis2=-1)
    lam_max = jnp.minimum(inf_norm, trace)[..., None, None]
    if lam_min is not None:
        norm = 0.5 * (lam_max + jnp.asarray(lam_min, a.dtype))
    else:
        norm = lam_max
    norm = jnp.maximum(norm, jnp.finfo(a.dtype).tiny)
    a_n = a / norm
    hp = jax.lax.Precision.HIGHEST

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - jnp.einsum("...ij,...jk->...ik", z, y,
                                          precision=hp))
        y = jnp.einsum("...ij,...jk->...ik", y, t, precision=hp)
        z = jnp.einsum("...ij,...jk->...ik", t, z, precision=hp)
        return y, z

    y, z = jax.lax.fori_loop(
        0, num_iters, body, (a_n, jnp.broadcast_to(eye, a.shape))
    )
    sqrt_norm = jnp.sqrt(norm)
    return y * sqrt_norm, z / sqrt_norm


@partial(jax.jit, static_argnames=("num_iters",))
def inv_spd_newton(
    a: jnp.ndarray,
    num_iters: int = 12,
    lam_min: Optional[float] = None,
) -> jnp.ndarray:
    """Matmul-only inverse of a batched SPD matrix via Newton–Schulz
    ``V <- V (2I - A V)``, seeded with the optimal scalar ``2/(lmin+lmax) I``.
    """
    k = a.shape[-1]
    eye = jnp.eye(k, dtype=a.dtype)
    inf_norm = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)
    trace = jnp.trace(a, axis1=-2, axis2=-1)
    lam_max = jnp.minimum(inf_norm, trace)[..., None, None]
    if lam_min is not None:
        scale = 2.0 / (lam_max + jnp.asarray(lam_min, a.dtype))
    else:
        scale = 1.0 / lam_max
    hp = jax.lax.Precision.HIGHEST

    def body(_, v):
        av = jnp.einsum("...ij,...jk->...ik", a, v, precision=hp)
        return v + jnp.einsum(
            "...ij,...jk->...ik", v, eye - av, precision=hp
        )

    return jax.lax.fori_loop(0, num_iters, body, scale * eye + 0.0 * a)
