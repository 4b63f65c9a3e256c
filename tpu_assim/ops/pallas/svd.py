"""
Batched singular value decomposition as a Pallas TPU kernel
(one-sided Hestenes Jacobi, Brent-Luk tournament ordering).

Why: the IEnKS inner step runs TWO batched K x K SVDs per grid column
(reference LAPACK call site: /root/reference/pytassim/core/utils.py:122
``torch.svd``, called from core/ienks.py:58-69 and :92-106), with the
localized variants batching B ~ 10^4..10^6 columns of K ~ 20..100 — the
same many-tiny-matrices shape for which XLA's batched ``jnp.linalg.eigh``
costs ~1.0 s at [10^4, 40, 40] f32 on v5e and motivated the two-sided
Jacobi eigh kernel (ops/pallas/jacobi.py). XLA's batched ``svd`` at that
shape is even slower (bidiagonalization + QR iteration, measured in
scripts/validate_svd.py).

Method: one-sided Jacobi. The matrix is carried COLUMN-MAJOR-TRANSPOSED
(``a_t[j] = A[:, j]`` as rows, lane-major [K_col, K_row, T] with T = 128
matrices in the lane dimension). Each round applies plane rotations from
the RIGHT that orthogonalize all K/2 disjoint column pairs of one
Brent-Luk tournament pairing simultaneously; at convergence the columns
are mutually orthogonal, so ``A = U diag(sigma) V^T`` with
``sigma_j = ||a_j||``, ``u_j = a_j / sigma_j`` and V the accumulated
product of rotations. The payoff of the transposed carry: the rotated /
re-seated axis is the LEADING (untiled) one for BOTH carries, so every
per-round op uses the cheap (K/2, 2)-split pairswap/re-seat forms
(``_pairswap0`` / ``_perm_round0``) — no full-tensor lane rolls at all,
unlike the two-sided eigh kernel which must rotate rows AND columns.

Per round, for each column seat j with partner j^1 (all [K, T] / [K, K, T]
elementwise + untiled reshuffles):

    alpha_j = ||a_j||^2          (row-sum of a_t * a_t)
    gamma_j = a_j . a_{j^1}      (row-sum of a_t * pairswap0(a_t);
                                  bitwise-symmetric between partners)
    beta_j  = alpha_{j^1}
    tau_j   = (beta_j - alpha_j) / (2 gamma_j)
    t_j     = sign(tau_j) / (|tau_j| + sqrt(1 + tau_j^2))   (stable root
              of t^2 + 2 tau t - 1 = 0: zeroes the rotated pair's gamma)
    c_j = 1/sqrt(1 + t_j^2), s_j = t_j c_j   (s_{j^1} = -s_j: tau is
                                              antisymmetric in the pair)
    a_t[j] <- c_j a_t[j] - s_j a_t[j^1]      (A <- A R)
    v_t[j] <- c_j v_t[j] - s_j v_t[j^1]      (V <- V R)
    re-seat both (composes to identity every K - 1 rounds)

Convergence: a pair freezes (identity rotation) when
``|gamma| <= 8 K eps ||a_p|| ||a_q||`` — the standard Hestenes criterion
at the iteration's rounding floor. The sweep loop EXITS once a full sweep
applied no live rotation (every pair met and was frozen): unlike a
current-seating-only check this is exact by construction, and a converged
sweep re-seats to the identity, so the exit is bitwise-free.

Contract: matches ``jnp.linalg.svd(full_matrices=False)`` on square
batches up to column signs (arbitrary there too) — descending singular
values, ``A == U @ diag(s) @ V^T``. Exactly-zero singular values leave
the corresponding U column zero (LAPACK returns an arbitrary orthonormal
completion instead); the IEnKS consumers invert the singular values, so
rank-deficient inputs are out of contract for both.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_assim.ops.pallas.jacobi import (
    _mask_iota,
    _pairswap0,
    _perm_round0,
)

__all__ = ["svd_jacobi", "eigh_svd_jacobi"]


@functools.partial(
    jax.jit, static_argnames=("sweeps", "tile", "interpret")
)
def eigh_svd_jacobi(
    a: jnp.ndarray,
    sweeps: int = 20,
    tile: int = 128,
    interpret: bool | None = None,
):
    """Batched symmetric eigendecomposition THROUGH the one-sided SVD
    kernel: for symmetric ``A = U diag(s) V^T``, the eigenvectors are V
    and the eigenvalues are ``s * sign(diag(U^T V))`` (``u_j = ±v_j``
    with the sign of ``lambda_j``).

    Why route eigh through an SVD: the one-sided kernel's per-round work
    is ALL cheap untiled-axis forms (transposed carry — see module
    docstring), while the two-sided eigh kernel must rotate rows AND
    columns of A, paying ~6 full-tensor lane ops per round for the
    axis-1 permutation alone. Measured at [10^4, 40, 40] f32 random SPD
    on v5e: 115 ms vs 212 ms for :func:`eigh_jacobi` (8.5x XLA's 982 ms;
    per-call-sync timing — steady-state chained slopes run ~40% lower
    for all of these) at better quality (reconstruction 2.6e-5 vs
    1.1e-4 relative) — V is a pure product of plane rotations, so its
    orthogonality (~1e-5 compiled) never degrades with conditioning
    (scripts/validate_eigh_svd.py).

    Contract: :func:`jnp.linalg.eigh` conventions (ascending eigenvalues,
    eigenvector columns, signs arbitrary) for PSD inputs — the
    :func:`tpu_assim.ops.linalg.eigh_psd` use case — and for any
    symmetric matrix whose spectrum has no exact +lambda/-lambda
    magnitude tie. On such a tie the singular subspace is degenerate and
    U/V may mix the two eigendirections (e.g. [[0, 1], [1, 0]] freezes
    immediately with V = I); the solver Gram matrices are PSD up to
    f32 roundoff, where a tie at |lambda| ~ eps only mixes
    eigendirections of eigenvalues that the consumers clamp to zero
    anyway.
    """
    u, s, v = svd_jacobi(a, sweeps=sweeps, tile=tile, interpret=interpret)
    sign = jnp.sign(jnp.einsum("...ki,...ki->...i", u, v))
    evals = s * jnp.where(sign == 0, 1.0, sign)
    order = jnp.argsort(evals, axis=-1, stable=True)
    evals = jnp.take_along_axis(evals, order, axis=-1)
    evecs = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return evals, evecs


def _svd_kernel(a_ref, s_ref, u_ref, v_ref, *, k, sweeps):
    dtype = a_ref.dtype
    a = a_ref[:][0]                                  # [K_col, K_row, T]
    t_cols = a.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    eye2 = (row == col).astype(dtype)                # [K, K]
    v = eye2[:, :, None] * jnp.ones((1, 1, t_cols), dtype)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (k, t_cols), 0)
    even = i1 % 2 == 0
    eps = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    feps = jnp.asarray(8 * k * jnp.finfo(dtype).eps, dtype)

    def round_body(_, carry):
        a, v, any_live = carry
        ps = _pairswap0(a, k)
        # gamma is bitwise-symmetric between partners: the elementwise
        # products commute and the row reduction order is identical, so
        # no symmetrization step is needed (unlike the eigh kernel's o)
        gam = jnp.sum(a * ps, axis=1)                         # [K, T]
        alp = jnp.sum(a * a, axis=1)                          # [K, T]
        bet = _pairswap0(alp, k)
        tol = feps * (jnp.sqrt(alp) * jnp.sqrt(bet)) + eps
        live = jnp.abs(gam) > tol
        gam_safe = jnp.where(live, gam, 1.0)
        tau = (bet - alp) / (2.0 * gam_safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        # tau == 0 (equal column norms, live gamma): 45-degree rotation;
        # sign(0) = 0 would stall, and the override must stay
        # antisymmetric between partners, so pick t by seat parity
        t = jnp.where(tau == 0.0, jnp.where(even, 1.0, -1.0), t)
        # exact reciprocal sqrt (see jacobi.py: the VPU rsqrt
        # approximation compounds non-orthogonality over rotations)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(live, c, 1.0)
        s = jnp.where(live, s, 0.0)
        a = c[:, None, :] * a - s[:, None, :] * ps
        v = c[:, None, :] * v - s[:, None, :] * _pairswap0(v, k)
        a = _perm_round0(a, k)
        v = _perm_round0(v, k)
        return a, v, jnp.logical_or(any_live, jnp.any(live))

    def sweep_cond(state):
        _a, _v, i, prev_live = state
        return jnp.logical_and(i < sweeps, prev_live)

    def sweep_body(state):
        a, v, i, _prev = state
        a, v, any_live = jax.lax.fori_loop(
            0, k - 1, round_body, (a, v, jnp.asarray(False))
        )
        return a, v, i + 1, any_live

    a, v, _, _ = jax.lax.while_loop(
        sweep_cond, sweep_body,
        (a, v, jnp.asarray(0, jnp.int32), jnp.asarray(True)),
    )
    nrm2 = jnp.sum(a * a, axis=1)                             # [K, T]
    sig = jnp.sqrt(nrm2)
    s_ref[:] = sig[None]
    inv = jnp.where(sig > eps, 1.0 / jnp.maximum(sig, eps), 0.0)
    u_ref[:] = (a * inv[:, None, :])[None]          # transposed U
    v_ref[:] = v[None]                              # transposed V


@functools.partial(
    jax.jit, static_argnames=("sweeps", "tile", "interpret")
)
def svd_jacobi(
    a: jnp.ndarray,
    sweeps: int = 20,
    tile: int = 128,
    interpret: bool | None = None,
):
    """Batched square SVD, descending singular values.

    Parameters
    ----------
    a : [..., K, K] square matrices (any leading batch shape).
    sweeps : maximum Hestenes sweeps (each = K - 1 parallel rounds
        covering every column pair once); the loop exits as soon as a
        full sweep applies no rotation, so the default 20 is a CAP, not
        a cost — random f32 batches at K = 40 converge in ~7, sigma
        spanning 1e4 needs ~12-16 (a cap of 10 left U visibly
        non-orthogonal there: each tile pays only the sweeps it needs,
        and an exhausted cap degrades silently — measured in
        scripts/validate_svd.py).
    tile : matrices per kernel program (lane dimension).

    Returns ``(u [..., K, K], s [..., K], v [..., K, K])`` with
    ``a == u @ diag(s) @ v.T`` — :func:`jnp.linalg.svd` conventions
    except that ``v`` (not ``v^T``) is returned, matching
    :func:`tpu_assim.ops.linalg.svd` / the reference's ``torch.svd``.
    """
    from tpu_assim.ops.pallas.letkf import _resolve_interpret

    batch_shape = a.shape[:-2]
    k = a.shape[-1]
    if a.shape[-2] != k:
        raise ValueError(f"square trailing dims required, got {a.shape}")
    dtype = a.dtype
    b = int(np.prod(batch_shape)) if batch_shape else 1
    # transposed carry: a_t[j, i, b] = A[b, i, j]
    a2 = jnp.transpose(a.reshape(b, k, k), (2, 1, 0))  # [K_col, K_row, B]
    # The tournament pairing needs an even seat count: odd K gets one
    # zero pad column (sigma = 0 exactly, frozen every round — its
    # gamma is identically zero) and one zero pad row; both slice off
    # below (the pad's sigma ties only with genuine zero singular
    # values, and the stable descending sort keeps genuine ones first).
    kp = k + (k % 2)
    if kp != k:
        a2 = jnp.pad(a2, ((0, 1), (0, 1), (0, 0)))
    n_tiles = -(-b // tile)
    pad = n_tiles * tile - b
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, pad)))

    interp = _resolve_interpret(interpret)
    kernel = functools.partial(_svd_kernel, k=kp, sweeps=sweeps)
    sig, u_t, v_t = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, kp, kp, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, kp, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, kp, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, kp, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, kp, n_tiles * tile), dtype),
            jax.ShapeDtypeStruct((1, kp, kp, n_tiles * tile), dtype),
            jax.ShapeDtypeStruct((1, kp, kp, n_tiles * tile), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interp,
    )(a2[None])
    sig = jnp.moveaxis(sig[0, :, :b], -1, 0)                 # [B, KP]
    u = jnp.transpose(u_t[0, :, :, :b], (2, 1, 0))           # [B, K_row, K_col]
    v = jnp.transpose(v_t[0, :, :, :b], (2, 1, 0))
    # descending singular values (the jnp.linalg.svd convention); stable
    # sort so the odd-K pad (last seat, sigma exactly 0) never displaces
    # a genuine zero singular value from the kept slice
    order = jnp.argsort(-sig, axis=-1, stable=True)
    sig = jnp.take_along_axis(sig, order, axis=-1)
    u = jnp.take_along_axis(u, order[:, None, :], axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    sig = sig[:, :k]
    u = u[:, :k, :k]
    v = v[:, :k, :k]
    return (
        u.reshape(batch_shape + (k, k)),
        sig.reshape(batch_shape + (k,)),
        v.reshape(batch_shape + (k, k)),
    )
