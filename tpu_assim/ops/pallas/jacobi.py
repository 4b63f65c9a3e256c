"""
Batched symmetric eigendecomposition as a Pallas TPU kernel
(parallel-order cyclic Jacobi, Brent-Luk tournament ordering).

Why: the ETKF weight solve eigendecomposes [B, K, K] Gram matrices with
B ~ 10^4..10^6 and K ~ 20..100 (reference LAPACK call site:
/root/reference/pytassim/core/utils.py:57 ``torch.symeig``). XLA's batched
``jnp.linalg.eigh`` on TPU runs a QR-style path that costs ~1.0 s for
[10^4, 40, 40] f32 on v5e — 600x the fused analysis kernel. This kernel runs
two-sided Jacobi with *parallel ordering*: matrices live lane-major
([K, K, T], T = 128 matrices in the lane dimension) and every round applies
all K/2 disjoint Givens rotations of one pairing to ALL T matrices
simultaneously as a handful of full-width VPU operations.

Ordering: the Brent-Luk round-robin tournament. Rows/columns are *seats*;
the pairs are always the adjacent seats ``(2i, 2i+1)``, and after each round
every player except seat 0 moves one seat around the ring (applied as an
explicit permutation of A's rows+columns and V's columns). Over ``K - 1``
rounds every unordered pair meets exactly once AND the seat permutation
composes back to the identity — so after any whole number of sweeps the
matrix is back in original index order. The payoff vs the arithmetic
"mod" ordering (partner ``(r - i) mod K``, round-dependent): every round's
body is *identical* (partner gather = adjacent-pair swap; the re-seating is
one fixed mask/shift select), so the whole iteration is ONE
``fori_loop`` whose body Mosaic compiles once — compile time drops from
~10 minutes (K unrolled rounds x K-slice reverse gathers) to a measured
12.8 s at [10^4, 40, 40] f32 on v5e, and the per-round data movement
shrinks from ~5K strided slices to ~9 rolls.

Measured on v5e (2026-08-20/21, scripts/validate_jacobi.py /
scripts/jacobi_sweeps.py / scripts/exp_jacobi_ops.py, [10^4, 40, 40] f32,
incl. a 24-fold degenerate cluster): eigenvector orthogonality ~1e-5
compiled, reconstruction ~1e-4..2e-4 relative (the f32 roundoff floor),
171-175 ms at the 7-sweep worst case vs 1017 ms for XLA's batched eigh —
5.8x (297 ms before the untiled-axis pairswap/re-seat forms and the
transposed-V carry). Sweeps now EXIT EARLY once every pair in the tile is
below the freeze threshold (a converged sweep applies only identity
rotations and re-seats to the identity, so the exit is bitwise-free):
easy spectra pay only what they need — 52.7 ms (~2 sweeps) on a
nearly-diagonal [10^4, 40, 40] batch vs 170.5 on random SPD Grams, at
~2.5% convergence-check overhead on the worst case. This is the default
TPU dispatch for :func:`tpu_assim.ops.linalg.eigh_psd`.

Jacobi is also the *accurate* choice: quadratic convergence once nearly
diagonal and high relative accuracy for small eigenvalues — the property
the parity tests check against ``jnp.linalg.eigh`` (1e-10 in f64 interpret
mode; f32 roundoff on the chip).

Per round (all [K, T] / [K, K, T] elementwise + static-shift roll work),
with ``swap`` the adjacent-pair swap and ``perm`` the tournament
re-seating:

    d_i   = A[i, i]                      (diagonal mask reduction)
    o_i   = A[i, i^1]                    (pair-off mask reduction)
    tau_i = (d_{i^1} - d_i) / (2 o_i)
    t_i   = sign(tau_i) / (|tau_i| + sqrt(1 + tau_i^2))    (stable root)
    c_i   = 1/sqrt(1 + t_i^2),  s_i = t_i c_i  (s_{i^1} = -s_i: tau is
                                                antisymmetric in the pair)
    A <- perm_rows(perm_cols(c_i A[i] - s_i A[i^1] applied to rows, then
                             columns))                     (A <- P G A G^T P^T)
    V <- perm_cols(c_j V[:, j] - s_j V[:, j^1])            (V <- V G^T P^T)

so ``A_in == V A_out V^T`` is invariant and A_out converges to
diag(evals). Odd K is padded with one decoupled seat (zero off-diagonals,
diagonal above the spectral bound): its pair is frozen every round (a
"bye"), its eigenpair is exact and sorts last, and the wrapper slices it
off.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["eigh_jacobi"]


def _mask_iota(shape_len, axis, k):
    """Seat-index iota broadcastable over a rank-``shape_len`` array whose
    ``axis`` has extent k."""
    shape = [1] * shape_len
    shape[axis] = k
    return jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)


def _pairswap(x, axis, k):
    """x[..., p ^ 1, ...]: swap adjacent pair seats along ``axis``
    (static-shift rolls + parity select — Mosaic has no gather/rev)."""
    p = _mask_iota(x.ndim, axis, k)
    nxt = jnp.roll(x, -1, axis=axis)   # x[p + 1]
    prv = jnp.roll(x, 1, axis=axis)    # x[p - 1]
    return jnp.where(p % 2 == 0, nxt, prv)


def _pairswap0(x, k):
    """pairswap along the LEADING (untiled) axis via the (K/2, 2) seat
    split + a stack-swap of the size-2 axis: pure untiled reindexing — no
    full-width rolls or selects (Mosaic has no rev, hence the stack).
    Bitwise-identical permutation to ``_pairswap(x, 0, k)``; 3 full-tensor
    ops -> ~1."""
    s = x.shape
    y = x.reshape((k // 2, 2) + s[1:])
    y = jnp.stack([y[:, 1], y[:, 0]], axis=1)
    return y.reshape(s)


def _perm_round(x, axis, k):
    """The tournament re-seating along ``axis``: seat 0 fixed, everyone
    else one step around the ring. new[p] = old[src(p)] with
    src = p (p=0) | p-1 (p in {2, K-1}) | p-2 (p even) | p+2 (p odd)."""
    if k == 2:
        return x
    p = _mask_iota(x.ndim, axis, k)
    r2p = jnp.roll(x, 2, axis=axis)    # old[p - 2]
    r2m = jnp.roll(x, -2, axis=axis)   # old[p + 2]
    r1p = jnp.roll(x, 1, axis=axis)    # old[p - 1]
    out = jnp.where(p % 2 == 0, r2p, r2m)
    out = jnp.where((p == 2) | (p == k - 1), r1p, out)
    return jnp.where(p == 0, x, out)


def _perm_round0(x, k):
    """Tournament re-seating along the LEADING (untiled) axis via the
    (K/2, 2) seat split: even seats roll +1 in the pair index, odd seats
    roll -1, patch seats 0, 2, K-1 — half-tensor rolls + small selects
    instead of three full-tensor rolls + three full-tensor selects.
    Bitwise-identical permutation to ``_perm_round(x, 0, k)``."""
    if k == 2:
        return x
    s = x.shape
    y = x.reshape((k // 2, 2) + s[1:])
    ev = jnp.roll(y[:, 0], 1, axis=0)     # new even seats 2i <- old 2i-2
    od = jnp.roll(y[:, 1], -1, axis=0)    # new odd seats 2i+1 <- old 2i+3
    i = _mask_iota(ev.ndim, 0, k // 2)
    ev = jnp.where(i == 0, y[0, 0][None], ev)               # seat 0 fixed
    ev = jnp.where(i == 1, y[0, 1][None], ev)               # seat 2 <- 1
    od = jnp.where(i == k // 2 - 1, y[k // 2 - 1, 0][None],
                   od)                                      # seat K-1 <- K-2
    return jnp.stack([ev, od], axis=1).reshape(s)


def _jacobi_kernel(a_ref, evals_ref, evecs_ref, *, k, sweeps):
    dtype = a_ref.dtype
    a = a_ref[:][0]                                   # [K, K, T]
    t_cols = a.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    eye2 = (row == col).astype(dtype)                 # [K, K]
    # pair-off mask: the (p, p^1) entries
    anti = ((row // 2 == col // 2) & (row != col)).astype(dtype)
    v = eye2[:, :, None] * jnp.ones((1, 1, t_cols), dtype)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (k, t_cols), 0)
    even = i1 % 2 == 0
    eps = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    def round_body(_, av):
        a, v = av
        d = jnp.sum(a * eye2[:, :, None], axis=1)             # [K, T]
        o = jnp.sum(a * anti[:, :, None], axis=1)             # [K, T]
        # symmetrize the pair's off value: A drifts from symmetry at
        # the eps level, and once |a_pq| decays TO that level the two
        # partners would otherwise compute structurally different
        # rotations — a non-orthogonal G that corrupts eigenvalues by
        # ~1e-5. One shared value keeps t_q == -t_p bitwise.
        o = 0.5 * (o + _pairswap0(o, k))
        dq = _pairswap0(d, k)
        o_safe = jnp.where(jnp.abs(o) > eps, o, 1.0)
        tau = (dq - d) / (2.0 * o_safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        # tau == 0 (equal diagonal, nonzero off-diag): 45-degree
        # rotation; sign(0) = 0 would stall convergence, and the
        # override must stay antisymmetric between the partners
        # (s_q = -s_p), so pick t by seat parity
        t = jnp.where(tau == 0.0, jnp.where(even, 1.0, -1.0), t)
        # exact reciprocal sqrt: Mosaic's rsqrt is the VPU fast
        # approximation, whose per-rotation non-orthogonality (~1e-4)
        # compounds over hundreds of accumulated rotations
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # converged pairs rotate by the identity. The threshold freezes
        # pairs whose off value is at the iteration's rounding floor
        # (~k*eps of the local diagonal scale): in degenerate clusters
        # such pairs otherwise rotate by noise-driven ~45-degree angles
        # every sweep, which chaos-amplifies compiled-vs-interpret
        # rounding differences and degrades the accumulated V's
        # orthogonality ~100x. The odd-K pad seat's pair has o == 0
        # exactly, so it freezes every round (its "bye").
        tol = jnp.asarray(8 * k * jnp.finfo(dtype).eps, dtype) * (
            jnp.abs(d) + jnp.abs(dq)
        ) + eps
        live = jnp.abs(o) > tol
        c = jnp.where(live, c, 1.0)
        s = jnp.where(live, s, 0.0)
        a = c[:, None, :] * a - s[:, None, :] * _pairswap0(a, k)
        a = c[None, :, :] * a - s[None, :, :] * _pairswap(a, 1, k)
        # V is carried TRANSPOSED ([column-seat, row, T]): its rotated /
        # re-seated axis is the leading untiled one, so both its update
        # ops use the cheap (K/2, 2)-split forms — 298 -> 171 ms at
        # [10^4, 40, 40] f32 together with the untiled-axis forms on A
        # (scripts/exp_jacobi_ops.py); one transpose at the end pays it
        # back. Bitwise-identical results (same permutations, same
        # arithmetic per element).
        v = c[:, None, :] * v - s[:, None, :] * _pairswap0(v, k)
        # re-seat for the next round (composes to identity every K-1
        # rounds, i.e. after every whole sweep)
        a = _perm_round0(a, k)
        a = _perm_round(a, 1, k)
        v = _perm_round0(v, k)
        return a, v

    def all_frozen(a):
        """Convergence of the whole tile: EVERY off-diagonal entry is below
        the pairwise freeze threshold of round_body — not just the entries
        of the current seating. (The cond runs before the first sweep, so a
        current-pairs-only check would declare any matrix whose (2i, 2i+1)
        entries happen to be small "converged" while off-diagonal mass
        sits elsewhere — a silent wrong answer; round-4 advisor finding.)
        If |a[i, j]| is below tol(i, j) for all i != j then whichever round
        seats the pair (i, j) sees a frozen pair (the symmetrized off value
        |(a_ij + a_ji) / 2| <= max(|a_ij|, |a_ji|) < tol), so a sweep in
        this state applies only identity rotations and re-seats back to
        the identity — exiting here is BITWISE identical to running the
        remaining sweeps: pure savings, never an approximation."""
        d = jnp.sum(a * eye2[:, :, None], axis=1)              # [K, T]
        ad = jnp.abs(d)
        tol = jnp.asarray(8 * k * jnp.finfo(dtype).eps, dtype) * (
            ad[:, None, :] + ad[None, :, :]
        ) + eps                                                # [K, K, T]
        off = jnp.abs(a) * (1.0 - eye2)[:, :, None]
        return jnp.logical_not(jnp.any(off > tol))

    def sweep_cond(state):
        a, _v, i = state
        return jnp.logical_and(i < sweeps, jnp.logical_not(all_frozen(a)))

    def sweep_body(state):
        a, v, i = state
        a, v = jax.lax.fori_loop(0, k - 1, round_body, (a, v))
        return a, v, i + 1

    a, v, _ = jax.lax.while_loop(
        sweep_cond, sweep_body, (a, v, jnp.asarray(0, jnp.int32))
    )
    evals_ref[:] = jnp.sum(a * eye2[:, :, None], axis=1)[None]
    evecs_ref[:] = jnp.swapaxes(v, 0, 1)[None]


@functools.partial(
    jax.jit, static_argnames=("sweeps", "tile", "interpret")
)
def eigh_jacobi(
    a: jnp.ndarray,
    sweeps: int = 7,
    tile: int = 128,
    interpret: bool | None = None,
):
    """Batched symmetric eigendecomposition, ascending eigenvalues.

    Parameters
    ----------
    a : [..., K, K] symmetric matrices (any leading batch shape).
    sweeps : full Jacobi sweeps (each = K - 1 parallel rounds covering
        every pair once). Runtime is linear in sweeps (~24 ms per sweep at
        [10^4, 40, 40] f32 on v5e); the default 7 is converged at K = 40
        (reconstruction at the f32 floor; sweeps=8 buys ~2x on
        condition-1e4 spectra at +13% time — scripts/jacobi_sweeps.py).
    tile : matrices per kernel program (lane dimension; 128 measured
        fastest vs 256/512).

    Returns ``(evals [..., K], evecs [..., K, K])`` with
    ``a == evecs @ diag(evals) @ evecs.T`` — the :func:`jnp.linalg.eigh`
    contract (eigenvector columns; signs arbitrary, as there).
    """
    from tpu_assim.ops.pallas.letkf import _resolve_interpret

    batch_shape = a.shape[:-2]
    k = a.shape[-1]
    if a.shape[-2] != k:
        raise ValueError(f"square trailing dims required, got {a.shape}")
    dtype = a.dtype
    b = int(np.prod(batch_shape)) if batch_shape else 1
    a2 = jnp.moveaxis(a.reshape(b, k, k), 0, -1)       # [K, K, B]
    # The tournament pairing needs an even seat count: odd K gets one
    # decoupled pad seat (zero off-diagonals) whose diagonal sits strictly
    # above every real eigenvalue (Gershgorin), so its exact eigenpair
    # always sorts last and is sliced off below.
    kp = k + (k % 2)
    if kp != k:
        bound = 1.0 + jnp.max(jnp.sum(jnp.abs(a2), axis=1), axis=0)  # [B]
        a2 = jnp.pad(a2, ((0, 1), (0, 1), (0, 0)))
        a2 = a2.at[k, k, :].set(bound)
    n_tiles = -(-b // tile)
    pad = n_tiles * tile - b
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, pad)))

    interp = _resolve_interpret(interpret)
    kernel = functools.partial(_jacobi_kernel, k=kp, sweeps=sweeps)
    evals, evecs = pl.pallas_call(
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, kp, n_tiles * tile), dtype),
            jax.ShapeDtypeStruct((1, kp, kp, n_tiles * tile), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interp,
    )(a2[None])
    evals = jnp.moveaxis(evals[0, :, :b], -1, 0)           # [B, KP]
    evecs = jnp.moveaxis(evecs[0, :, :, :b], -1, 0)        # [B, KP, KP]
    # ascending eigenvalue order (the jnp.linalg.eigh convention); the odd-K
    # pad eigenpair is strictly largest, so [..., :k] drops exactly it (the
    # pad seat's V row is identically zero in every kept column).
    order = jnp.argsort(evals, axis=-1)
    evals = jnp.take_along_axis(evals, order, axis=-1)
    evecs = jnp.take_along_axis(evecs, order[:, None, :], axis=-1)
    evals = evals[:, :k]
    evecs = evecs[:, :k, :k]
    return (
        evals.reshape(batch_shape + (k,)),
        evecs.reshape(batch_shape + (k, k)),
    )
