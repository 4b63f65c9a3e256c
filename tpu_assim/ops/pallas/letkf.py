"""
Fused Pallas TPU kernel for the localized-ETKF analysis over fixed-size obs
neighborhoods.

Why a kernel: the solve is ~35 batched nb x nb / nb x K contractions per
grid column. Left to XLA these become ~35 separate HBM-resident batched ops;
on TPU each [g, 16, 16]-ish batched matmul is layout-padded and costs
milliseconds of HBM traffic, so the whole solve runs ~40 ms for the
benchmark workload (g=10k, K=40, nb=16) — two orders of magnitude off the
FLOP bound. This kernel processes a tile of grid columns entirely in VMEM:
one HBM read of the tile's inputs, the full Woodbury-form solve
(see ops/etkf.py:_letkf_weights_nbh_woodbury), the weight application, and
one HBM write of the analysed tile.

The dual (Woodbury) formulation also means the K x K weight matrices are
never materialized: with ``Zh`` the scaled neighborhood perturbations
[nb, K] of one column, ``X = I + Zh Zh^T / reg`` (nb x nb),

    analysis = mean
             + (Zh^T X^{-1} yh) / reg                            (mean update)
             + alpha * sp                                        (inflated perts)
             - (alpha / reg) * Zh^T N (Zh sp),  N = (X^{1/2}+I)^{-1} X^{-1/2}

with ``alpha = sqrt((K-1)/reg)`` and ``sp`` the state perturbations of the
column. All iteration state is [T, nb, nb] for a tile of T columns.

Reference semantics: pytassim/core/etkf.py:57-77 (weight solve),
pytassim/interface/wrapper.py:86-99 (localized scaling),
pytassim/interface/base.py:256-278 (weight application).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "letkf_nbh_analysis_fused",
    "letkf_nbh_analysis_cheb",
    "letkf_window_analysis_fused",
    "letkf_window_analysis_fused_2d",
    "cheb_degree_for",
    "required_obs_block",
    "required_obs_block_2d",
    "max_in_support_1d",
    "max_in_support_2d",
]


def cheb_degree_for(lam_max: float, tol: float = 1e-6,
                    lo: int = 6, hi: int = 96) -> int:
    """Chebyshev degree reaching truncation error ``tol`` for the solve
    functions ``1/x`` and ``1/(sqrt(x)(1+sqrt(x)))`` on ``[1, lam_max]``.

    Both functions are analytic on the interval with the nearest singularity
    at ``x = 0``, so their Chebyshev coefficients decay like ``rho^-m`` with
    ``rho = (sqrt(lam) + 1)/(sqrt(lam) - 1)`` (the Bernstein-ellipse
    parameter through 0). The degree is the smallest ``d`` with
    ``rho^-d <= tol`` — a slightly conservative bound (the measured
    end-to-end error is ~10-30x below it, tests/test_letkf_fused_interface).
    """
    import math

    lam = max(float(lam_max), 1.0 + 1e-6)
    rho = (math.sqrt(lam) + 1.0) / (math.sqrt(lam) - 1.0)
    d = int(math.ceil(math.log(1.0 / tol) / math.log(rho)))
    return max(lo, min(hi, d))


def required_obs_block_2d(obs_y, grid_y, radius_y: float,
                          tile: int = 128) -> int:
    """Exact per-tile obs block width for
    :func:`letkf_window_analysis_fused_2d` (host-side, numpy).

    A tile's block holds every observation inside its y-band
    ``[min(gy) - 2 ry, max(gy) + 2 ry]`` (the Gaspari-Cohn support along y);
    this returns the sublane-aligned maximum band population over tiles —
    the smallest block that never drops an in-support observation.
    ``obs_y`` need not be sorted (the kernel sorts internally).
    """
    import numpy as np

    obs_y = np.sort(np.asarray(obs_y))
    grid_y = np.asarray(grid_y)
    o = obs_y.shape[0]
    g = grid_y.shape[0]
    n_tiles = -(-g // tile)
    pad = n_tiles * tile - g
    if pad:
        grid_y = np.concatenate([grid_y, np.full(pad, grid_y[-1])])
    tiles = grid_y.reshape(n_tiles, tile)
    lo = tiles.min(axis=1) - 2.0 * radius_y
    hi = tiles.max(axis=1) + 2.0 * radius_y
    counts = (np.searchsorted(obs_y, hi, side="right")
              - np.searchsorted(obs_y, lo))
    width = max(int(counts.max()) if n_tiles else 8, 8)
    return min(o, -(-width // 8) * 8)


def required_obs_block(obs_x, grid_x, nb: int, tile: int = 128,
                       radius: float | None = None, taper: str = "gc2",
                       epsilon: float = 1e-5) -> int:
    """Exact per-tile obs block width for
    :func:`letkf_window_analysis_fused` (host-side, numpy).

    Replicates the kernel's blocking math: tile t spans grid columns
    ``[t*tile, (t+1)*tile)``; its block must contain every column's
    clamped window AND (when ``radius`` is given) every column's full
    taper-support index range ``[l, h)`` — the support coverage is what
    makes the kernel's in-block support counts (the window clamp and the
    strict nb-overflow guard) globally exact. Returns the sublane-aligned
    maximum width over tiles — the smallest block for which the blocked
    kernel is *exact* (bit-identical windows to the full-table kernel),
    whatever the obs clustering.
    """
    import numpy as np

    from tpu_assim.ops.localization import taper_support_z

    obs_x = np.asarray(obs_x)
    grid_x = np.asarray(grid_x)
    o = obs_x.shape[0]
    g = grid_x.shape[0]
    n_tiles = -(-g // tile)
    pad = n_tiles * tile - g
    if pad:
        grid_x = np.concatenate([grid_x, np.full(pad, grid_x[-1])])
    tiles = grid_x.reshape(n_tiles, tile)
    tmin = tiles.min(axis=1)
    tmax = tiles.max(axis=1)
    s = taper_support_z(taper, epsilon) * radius if radius else 0.0
    offs = np.minimum(
        np.searchsorted(obs_x, tmin) - nb,
        np.searchsorted(obs_x, tmin - s, side="right"),
    )
    offs = np.clip(offs, 0, max(o - 1, 0))
    rank_hi = np.searchsorted(obs_x, tmax, side="right")
    end_needed = np.maximum(
        np.clip(rank_hi, 0, max(o - nb, 0)) + nb,
        np.searchsorted(obs_x, tmax + s, side="left"),
    )
    width = int(np.max(end_needed - offs)) if n_tiles else 2 * nb
    width = max(width, 2 * nb)
    return min(o, -(-width // 8) * 8)



def max_in_support_1d(obs_x, grid_x, radius: float, taper: str = "gc2",
                      epsilon: float = 1e-5) -> int:
    """Max per-column count of in-support observations (host-side numpy,
    exact): obs with taper weight > epsilon, i.e. ``|x - gx| < z* radius``
    with ``z* = taper_support_z(taper, epsilon)``. The window kernels are
    exact iff this is <= ``nb`` — concrete callers raise on violation
    instead of relying on the kernels' NaN-poisoning."""
    import numpy as np

    from tpu_assim.ops.localization import taper_support_z

    obs_x = np.sort(np.asarray(obs_x))
    grid_x = np.asarray(grid_x)
    s = taper_support_z(taper, epsilon) * radius
    lo = np.searchsorted(obs_x, grid_x - s, side="right")
    hi = np.searchsorted(obs_x, grid_x + s, side="left")
    return int((hi - lo).max()) if grid_x.size else 0


def max_in_support_2d(obs_xy, grid_xy, radius_x: float, radius_y: float,
                      taper: str = "gc2", epsilon: float = 1e-5,
                      tile: int = 128) -> int:
    """Max per-column count of y-band observations inside the x-cutoff
    (host-side numpy, exact) — the 2-D window kernel's slot-exhaustion
    measure: per grid tile the band is ``[min(gy) - 2 ry, max(gy) + 2 ry]``
    (mirroring the kernel prologue), and each column counts band obs with
    ``|dx| < z* rx``. The fused 2-D kernel is exact iff this is <= ``nb``.
    """
    import numpy as np

    from tpu_assim.ops.localization import taper_support_z

    obs_xy = np.asarray(obs_xy)
    grid_xy = np.asarray(grid_xy)
    g = grid_xy.shape[0]
    if g == 0 or obs_xy.shape[0] == 0:
        return 0
    order = np.argsort(obs_xy[:, 1], kind="stable")
    oy = obs_xy[order, 1]
    ox = obs_xy[order, 0]
    sx = taper_support_z(taper, epsilon) * radius_x
    n_tiles = -(-g // tile)
    worst = 0
    for t in range(n_tiles):
        gx = grid_xy[t * tile:(t + 1) * tile, 0]
        gy = grid_xy[t * tile:(t + 1) * tile, 1]
        b0 = np.searchsorted(oy, gy.min() - 2.0 * radius_y)
        b1 = np.searchsorted(oy, gy.max() + 2.0 * radius_y, side="right")
        if b1 <= b0:
            continue
        bx = np.sort(ox[b0:b1])
        lo = np.searchsorted(bx, gx - sx, side="right")
        hi = np.searchsorted(bx, gx + sx, side="left")
        worst = max(worst, int((hi - lo).max()))
    return worst


def _resolve_interpret(interpret):
    """None = auto: interpret mode off-TPU (the CPU test environment), the
    compiled Mosaic kernel on TPU."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret

def _coupled_ns(x, eye, num_iters):
    """Coupled Newton-Schulz: x (scaled to spectrum in (0,2)) ->
    (x^{1/2}, x^{-1/2}), matmul-only."""

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - jnp.einsum(
            "cij,cjk->cik", z, y, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        y = jnp.einsum("cij,cjk->cik", y, t,
                       preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        z = jnp.einsum("cij,cjk->cik", t, z,
                       preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return y, z

    return jax.lax.fori_loop(
        0, num_iters, body, (x, jnp.broadcast_to(eye, x.shape))
    )


def _ns_inverse(a, scale, eye, num_iters):
    """Newton-Schulz inverse of SPD ``a`` seeded with ``scale * I``."""

    def body(_, v):
        av = jnp.einsum("cij,cjk->cik", a, v,
                        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return v + jnp.einsum("cij,cjk->cik", v, eye - av,
                              preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    v0 = scale * jnp.broadcast_to(eye, a.shape)
    return jax.lax.fori_loop(0, num_iters, body, v0)


def _letkf_kernel(reg_ref, zh_ref, yh_ref, sp_ref, mean_ref, out_ref,
                  *, ens_size, num_iters):
    """One tile of T grid columns, fully VMEM-resident.

    zh [T, nb, k] scaled neighborhood perts; yh [T, nb] scaled innovations;
    sp [T, k] state perturbations; mean [T, 1] state mean; out [T, k].
    """
    f32 = jnp.float32
    reg = reg_ref[0]
    zh = zh_ref[:]
    yh = yh_ref[:]
    sp = sp_ref[:]
    nb = zh.shape[1]
    eye = jnp.eye(nb, dtype=f32)

    # S = Zh Zh^T over k (per column)  [T, nb, nb]
    s = jnp.einsum("cnk,cmk->cnm", zh, zh, preferred_element_type=f32,
                   precision=jax.lax.Precision.HIGHEST)
    x = eye + s / reg

    #

    # Scale for the coupled NS sqrt: spectrum of x is [1, 1 + tr(s)/reg];
    # optimal affine scale 2 / (lam_min + lam_max).
    trace = jnp.sum(jnp.einsum("cnn->cn", x), axis=-1)[:, None, None]
    inf_norm = jnp.max(jnp.sum(jnp.abs(x), axis=-1), axis=-1)[:, None, None]
    lam_max = jnp.minimum(trace, inf_norm)
    norm = 0.5 * (lam_max + 1.0)
    x_n = x / norm
    y_s, z_s = _coupled_ns(x_n, eye, num_iters)
    sqrt_norm = jnp.sqrt(norm)
    x_sqrt = y_s * sqrt_norm           # X^{1/2}
    x_inv_sqrt = z_s / sqrt_norm       # X^{-1/2}
    x_inv = jnp.einsum("cij,cjk->cik", x_inv_sqrt, x_inv_sqrt,
                       preferred_element_type=f32,
                   precision=jax.lax.Precision.HIGHEST)

    # N = (X^{1/2} + I)^{-1} X^{-1/2}; spectrum of (X^{1/2}+I) is [2, 1+sqrt(lmax)]
    c = x_sqrt + eye
    c_lam_max = jnp.max(jnp.sum(jnp.abs(c), axis=-1), axis=-1)[:, None, None]
    c_inv = _ns_inverse(c, 2.0 / (2.0 + c_lam_max), eye, num_iters)
    n_mat = jnp.einsum("cij,cjk->cik", c_inv, x_inv_sqrt,
                       preferred_element_type=f32,
                   precision=jax.lax.Precision.HIGHEST)

    # The applied weights contract the state perturbations over the first
    # weight index (reference: xr.dot over 'ensemble', base.py:256-278):
    #   analysis[m] = mean + <sp, w_mean> + sum_k sp[k] W'[k, m].
    # With u = Zh sp, the mean term is <sp, w_mean> = <q, u>/reg (scalar per
    # column) and the perturbation term needs only nb-space products.
    alpha = jnp.sqrt((ens_size - 1.0) / reg)
    zh_t = jnp.swapaxes(zh, 1, 2)  # [T, k, nb] — Mosaic needs the
    # contraction dim last for batched matvecs.
    u = jnp.einsum("cnk,ck->cn", zh, sp, preferred_element_type=f32,
                   precision=jax.lax.Precision.HIGHEST)
    q = jnp.einsum("cnm,cm->cn", x_inv, yh, preferred_element_type=f32,
                   precision=jax.lax.Precision.HIGHEST)
    mean_upd = jnp.sum(q * u, axis=-1, keepdims=True) / reg      # [T, 1]
    v = jnp.einsum("cnm,cm->cn", n_mat, u, preferred_element_type=f32,
                   precision=jax.lax.Precision.HIGHEST)
    pert_upd = alpha * sp - (alpha / reg) * jnp.einsum(
        "ckn,cn->ck", zh_t, v, preferred_element_type=f32,
                   precision=jax.lax.Precision.HIGHEST)

    out_ref[:] = mean_ref[:] + mean_upd + pert_upd


@functools.partial(
    jax.jit,
    static_argnames=("ens_size", "num_iters", "tile", "interpret"),
)
def letkf_nbh_analysis_fused(
    zh: jnp.ndarray,
    yh: jnp.ndarray,
    sp: jnp.ndarray,
    mean: jnp.ndarray,
    reg: jnp.ndarray,
    ens_size: int,
    num_iters: int = 10,
    tile: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused localized-ETKF analysis for one batch of grid columns.

    Parameters
    ----------
    zh : [g, nb, k] sqrt(taper-weight)-scaled neighborhood obs perturbations.
    yh : [g, nb] sqrt(taper-weight)-scaled neighborhood innovations.
    sp : [g, k] state ensemble perturbations at each column.
    mean : [g] state ensemble mean at each column.
    reg : scalar regularizer ``(K-1)/rho``.
    ens_size : ensemble size K (static).
    num_iters : Newton-Schulz iterations (static).
    tile : grid columns per kernel program (static). 128 fits comfortably in
        VMEM for K<=64, nb<=32 (the [tile, nb, nb] iteration buffers pad the
        lane dim to 128, so VMEM cost is ~8x the logical size).

    Returns
    -------
    analysis : [g, k] analysed ensemble (member-major transposed outside).
    """
    g, nb, k = zh.shape
    f32 = jnp.float32
    n_tiles = -(-g // tile)
    pad = n_tiles * tile - g
    if pad:
        zh = jnp.pad(zh, ((0, pad), (0, 0), (0, 0)))
        yh = jnp.pad(yh, ((0, pad), (0, 0)))
        sp = jnp.pad(sp, ((0, pad), (0, 0)))
        mean = jnp.pad(mean, ((0, pad),))
    reg_arr = jnp.reshape(reg.astype(f32), (1,))

    kernel = functools.partial(
        _letkf_kernel, ens_size=ens_size, num_iters=num_iters
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, nb, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, nb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, k), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=_resolve_interpret(interpret),
    )(reg_arr, zh.astype(f32), yh.astype(f32), sp.astype(f32),
      mean.astype(f32)[:, None])
    return out[:g]


# ---------------------------------------------------------------------------
# Chebyshev lane-major kernel
# ---------------------------------------------------------------------------
#
# The Newton-Schulz kernel above iterates full nb x nb *matrix* functions,
# but the analysis only ever needs their action on two vectors per column:
#
#     q = X^{-1} yh                      (mean update <u, q>/reg)
#     v = f(X) u,  f(x) = 1/(sqrt(x) (1 + sqrt(x)))   (perturbation update)
#
# with X = I + Zh Zh^T / reg whose spectrum lies in [1, 1 + min(||S||_inf,
# tr S)/reg]. Both are evaluated with one degree-d Chebyshev expansion each
# (coefficients computed per column from f at the mapped Chebyshev nodes via
# a static DCT matmul) and a joint Clenshaw recurrence of batched matvecs —
# ~15x fewer FLOPs than the matrix iteration.
#
# Layout: grid columns live in the LANE dimension ([.., T] with T=128), so
# every per-column matvec S@v becomes an elementwise multiply + sublane
# reduction at full VPU width — no 16x128-padded tiny matmuls at all.


def _cheb_nodes_dct(degree: int):
    import numpy as np

    j = np.arange(degree + 1)
    nodes = np.cos(np.pi * (j + 0.5) / (degree + 1))        # [-1, 1]
    m = np.arange(degree + 1)[:, None]
    dct = np.cos(np.pi * m * (j[None, :] + 0.5) / (degree + 1))
    dct = dct * (2.0 / (degree + 1))
    dct[0] *= 0.5
    return nodes.astype(np.float32), dct.astype(np.float32)


def _cheb_solve_apply(nodes, dct_mat, zh, yh, sp, mean, reg,
                      ens_size, degree, zzs=None, acc_form=False):
    """Shared Chebyshev/Clenshaw solve + weight application, lane-major.

    zh [nb, k, T] scaled neighborhood perts; yh [nb, T] scaled innovations;
    sp [ns, k, T] state perturbations of ns stacked (var, time) slices;
    mean [ns, 1, T] -> analysis [ns, k, T]. ``zzs`` is the SAME scaled
    perts in [k, nb, T] layout (nb on the sublane dim); window-kernel
    callers pass it for free (it is the selection-matmul output before the
    swapaxes), other callers leave it None and pay one relayout.

    The obs-space solve (Gram S, spectral bound, coefficients, q = X^{-1} yh)
    is shared across the ns state slices; only the per-slice operands
    u_i = Zh sp_i ride along. All 1 + ns Clenshaw operands run in ONE joint
    recurrence.

    ``acc_form=True`` (the compiled-Mosaic path) writes every per-lane
    contraction (Gram, S matvec, u, zv) as an ACCUMULATION over the
    contracted index — one sublane-slice + broadcast + FMA per step —
    instead of per-row broadcast-multiply + sublane-reduce stacks. The
    kernel is op-issue-bound, not FLOP-bound, and the FMA form issues ~4x
    fewer VPU ops with no separate reduce pass: measured 0.723 -> 0.215 ms
    on the benchmark workload (scripts/exp_matvec.py, v5e; rel-err 2e-7 —
    the two forms differ only in summation order). Interpret/XLA callers
    keep the stacked form (default): outside Mosaic the unrolled FMA chain
    is ~6x more ops for XLA to trace and run.
    """
    f32 = jnp.float32
    nb = zh.shape[0]
    ns = sp.shape[0]
    if acc_form and zzs is None:
        zzs = jnp.swapaxes(zh, 0, 1)                     # [k, nb, T]

    if acc_form:
        # S[n, m, c] = sum_k zh[n, k, c] zh[m, k, c], accumulated over k:
        # zh[:, k, :] is [nb, T] with n untiled, zzs[k] is [nb, T] with m
        # on the sublane dim — their broadcast product is one [nb,nb,T] FMA
        s = zh[:, 0, :][:, None, :] * zzs[0][None, :, :]
        for kk in range(1, ens_size):
            s = s + zh[:, kk, :][:, None, :] * zzs[kk][None, :, :]
        # [nb, nb, T]; symmetric, so s[m] is row m as [nb-sublane, T]
    else:
        # per-row broadcast-mult + sublane-reduce (the XLA-friendly form;
        # a single [nb, nb, k, T] broadcast would be fewer ops still, but
        # Mosaic cannot relayout the 4-D broadcast: "Invalid relayout:
        # non-singleton logical dimension is replicated")
        s = jnp.stack(
            [jnp.sum(zh[n][None, :, :] * zh, axis=1) for n in range(nb)],
            axis=0,
        )  # [nb, nb, T]

    # spectral upper bound per column (exact bound; 1.05 floor keeps the
    # affine map well-conditioned — columns with lam_max below the floor
    # only get a slightly wider, still-valid interval)
    nb_iota = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    nb_iota_c = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    eye_nb = (nb_iota == nb_iota_c).astype(f32)[:, :, None]
    inf_norm = jnp.max(jnp.sum(jnp.abs(s), axis=1), axis=0)
    trace = jnp.sum(s * eye_nb, axis=(0, 1))
    lam_ub = 1.0 + jnp.minimum(inf_norm, trace) / reg
    lam_ub = jnp.maximum(lam_ub, 1.05)                       # [T]

    # Chebyshev coefficients of f1(x)=1/x and f2(x)=1/(sqrt(x)(1+sqrt(x)))
    # on [1, lam_ub], per column: evaluate at mapped nodes, static DCT.
    t_nodes = nodes.reshape(-1, 1)                           # [d+1, 1]
    half_w = 0.5 * (lam_ub - 1.0)[None, :]
    x_nodes = (1.0 + half_w) + half_w * t_nodes              # [d+1, T]
    f1x = 1.0 / x_nodes
    sq = jnp.sqrt(x_nodes)
    f2x = 1.0 / (sq * (1.0 + sq))
    hp = jax.lax.Precision.HIGHEST
    c1 = jnp.einsum("mj,jc->mc", dct_mat, f1x,
                    preferred_element_type=f32, precision=hp)
    c2 = jnp.einsum("mj,jc->mc", dct_mat, f2x,
                    preferred_element_type=f32, precision=hp)
    # per-operand coefficient stack: slot 0 = f1 (innovations), 1.. = f2
    c_all = jnp.concatenate(
        [c1[:, None, :],
         jnp.broadcast_to(c2[:, None, :], c2.shape[:1] + (ns,) + c2.shape[1:])],
        axis=1,
    )                                                        # [d+1, 1+ns, T]

    # normalized operator: Xt = (2 X - (lam_ub + 1) I) / (lam_ub - 1) with
    # X = I + S/reg. The identity a_sc + b_sc == -1 (a_sc = 2/(lam_ub - 1),
    # b_sc = -(lam_ub + 1)/(lam_ub - 1)) collapses the affine map to
    # Xt v = (a_sc/reg) S v - v — two elementwise passes fewer per Clenshaw
    # step on a per-op-latency-bound kernel.
    a2_sc = (2.0 / (lam_ub - 1.0) / reg)[None, :]            # [1, T]

    if acc_form:
        def xt(vec):  # [1+ns, nb, T] -> [1+ns, nb, T]
            # S @ vec per operand, accumulated over m: s[m] is row m
            # (symmetry) as [nb-sublane, T]; vec[:, m, :] broadcasts over
            # the sublane dim.
            sv = s[0][None, :, :] * vec[:, 0, :][:, None, :]
            for m in range(1, nb):
                sv = sv + s[m][None, :, :] * vec[:, m, :][:, None, :]
            return a2_sc * sv - vec

        # u[i, n, c] = sum_k zzs[k, n, c] sp[i, k, c], accumulated over k
        u = zzs[0][None, :, :] * sp[:, 0, :][:, None, :]
        for kk in range(1, ens_size):
            u = u + zzs[kk][None, :, :] * sp[:, kk, :][:, None, :]
        # [ns, nb, T]
    else:
        def xt(vec):  # [1+ns, nb, T] -> [1+ns, nb, T]
            sv = jnp.sum(s[None] * vec[:, None, :, :], axis=2)  # S @ vec
            return a2_sc * sv - vec

        u = jnp.stack(
            [jnp.sum(zh * sp[i][None, :, :], axis=1) for i in range(ns)],
            axis=0,
        )                                                    # [ns, nb, T]
    w_all = jnp.concatenate([yh[None], u], axis=0)           # [1+ns, nb, T]

    b1 = jnp.zeros_like(w_all)
    b2 = jnp.zeros_like(w_all)
    for m_i in range(degree, 0, -1):
        b0 = c_all[m_i][:, None, :] * w_all + 2.0 * xt(b1) - b2
        b2, b1 = b1, b0
    res = c_all[0][:, None, :] * w_all + xt(b1) - b2         # [1+ns, nb, T]
    q = res[0]                                               # X^{-1} yh
    v = res[1:]                                              # f2(X) u

    alpha = jnp.sqrt((ens_size - 1.0) / reg)
    mean_upd = jnp.sum(u * q[None], axis=1, keepdims=True) / reg  # [ns, 1, T]
    if acc_form:
        # zv[i, k, c] = sum_n zh[n, k, c] v[i, n, c], accumulated over n
        zv = zh[0][None, :, :] * v[:, 0, :][:, None, :]
        for n in range(1, nb):
            zv = zv + zh[n][None, :, :] * v[:, n, :][:, None, :]
        # [ns, k, T]
    else:
        zv = jnp.stack(
            [jnp.sum(zh * v[i][:, None, :], axis=0) for i in range(ns)],
            axis=0,
        )                                                    # [ns, k, T]
    return mean + mean_upd + alpha * sp - (alpha / reg) * zv


def _letkf_cheb_kernel(reg_ref, nodes_ref, dct_ref, zh_ref, yh_ref, sp_ref,
                       mean_ref, out_ref, *, ens_size, degree,
                       acc_form=False):
    """One tile of T grid columns, lane-major ([.., T]).

    zh [nb, k, T] scaled neighborhood perts; yh [nb, T] scaled innovations;
    sp [ns, k, T] state perturbations; mean [ns, 1, T]; out [ns, k, T].
    """
    out_ref[:] = _cheb_solve_apply(
        nodes_ref[:], dct_ref[:], zh_ref[:], yh_ref[:], sp_ref[:],
        mean_ref[:], reg_ref[0], ens_size, degree, acc_form=acc_form,
    )


def _cheb_pallas(zh, yh, sp, mean3, reg_arr, ens_size, degree, tile,
                 interpret):
    """The raw pallas_call over padded f32 inputs (zh [nb, k, G],
    yh [nb, G], sp [ns, k, G], mean3 [ns, 1, G], G a multiple of tile)."""
    nb, k, gp = zh.shape
    ns = sp.shape[0]
    n_tiles = gp // tile
    nodes, dct = _cheb_nodes_dct(degree)
    kernel = functools.partial(
        _letkf_cheb_kernel, ens_size=ens_size, degree=degree,
        acc_form=not interpret,
    )
    dp1 = degree + 1
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, k, gp), jnp.float32),
        # grid tiles are independent; declaring it lets Mosaic pipeline
        # them (~3% on the benchmark workload). High auto-degrees (harsh
        # conditioning, e.g. smoother windows at degree ~60+) unroll enough
        # Clenshaw temporaries to blow the 16 MB default scoped-VMEM cap —
        # raise it like the 2-D kernel does (v5e has 128 MB physical).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(reg_arr, jnp.asarray(nodes)[None, :], jnp.asarray(dct), zh, yh, sp,
      mean3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _cheb_call(zh, yh, sp, mean3, reg_arr, statics):
    """Differentiable wrapper: Pallas forward, Chebyshev-consistent reverse.

    The backward pass is reverse-mode AD over :func:`_cheb_solve_apply` in
    plain XLA — polynomials and contractions only, so the gradient is
    NaN-free everywhere (unlike eigh-based matrix functions) and is the
    exact gradient OF the degree-d Chebyshev approximation the forward
    computes (consistent to f32 accuracy with the true analysis gradient).
    """
    return _cheb_pallas(zh, yh, sp, mean3, reg_arr, *statics)


def _cheb_call_fwd(zh, yh, sp, mean3, reg_arr, statics):
    return _cheb_call(zh, yh, sp, mean3, reg_arr, statics), (
        zh, yh, sp, mean3, reg_arr,
    )


def _cheb_call_bwd(statics, res, g):
    ens_size, degree, _tile, _interpret = statics
    zh, yh, sp, mean3, reg_arr = res
    nodes, dct = _cheb_nodes_dct(degree)

    def ref(zh_, yh_, sp_, mean_, reg_):
        return _cheb_solve_apply(
            jnp.asarray(nodes), jnp.asarray(dct), zh_, yh_, sp_, mean_,
            reg_[0], ens_size, degree,
        )

    _, vjp = jax.vjp(ref, zh, yh, sp, mean3, reg_arr)
    return vjp(g)


_cheb_call.defvjp(_cheb_call_fwd, _cheb_call_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("ens_size", "degree", "tile", "interpret"),
)
def letkf_nbh_analysis_cheb(
    zh: jnp.ndarray,
    yh: jnp.ndarray,
    sp: jnp.ndarray,
    mean: jnp.ndarray,
    reg: jnp.ndarray,
    ens_size: int,
    degree: int = 16,
    tile: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused localized-ETKF analysis, Chebyshev/Clenshaw form (lane-major).

    Parameters
    ----------
    zh : [nb, k, g] sqrt(taper-weight)-scaled neighborhood obs perturbations.
    yh : [nb, g] scaled innovations.
    sp : [k, g] — or [ns, k, g] for ns stacked (var, time) state slices that
        share the same obs-space solve (the 4-D interface state reshaped to
        [v*t, k, g]; the reference applies ONE weight matrix per column to
        every (var, time) slice, base.py:256-278).
    mean : [g] (or [ns, g]) state ensemble mean.
    reg : scalar regularizer ``(K-1)/rho``.
    ens_size : ensemble size K (static).
    degree : Chebyshev degree (static; 12 reaches ~1e-6 for the benchmark
        conditioning, see tests).

    Returns
    -------
    analysis : [k, g] (or [ns, k, g]) analysed ensemble (member-major).
    """
    multi = sp.ndim == 3
    if not multi:
        sp = sp[None]
        mean = mean[None]
    nb, k, g = zh.shape
    f32 = jnp.float32
    n_tiles = -(-g // tile)
    pad = n_tiles * tile - g
    if pad:
        zh = jnp.pad(zh, ((0, 0), (0, 0), (0, pad)))
        yh = jnp.pad(yh, ((0, 0), (0, pad)))
        sp = jnp.pad(sp, ((0, 0), (0, 0), (0, pad)))
        mean = jnp.pad(mean, ((0, 0), (0, pad)))
    reg_arr = jnp.reshape(reg.astype(f32), (1,))
    statics = (ens_size, degree, tile, _resolve_interpret(interpret))
    out = _cheb_call(
        zh.astype(f32), yh.astype(f32), sp.astype(f32),
        mean.astype(f32)[:, None, :], reg_arr, statics,
    )
    out = out[:, :, :g]
    return out if multi else out[0]


# ---------------------------------------------------------------------------
# Monolithic 1-D-window kernel: selection + taper + gather + solve + apply
# ---------------------------------------------------------------------------
#
# For the 1-D sorted-obs fast path everything upstream of the solve is cheap
# arithmetic the XLA graph nonetheless spends milliseconds on (sort-based
# searchsorted, [g, nb] gathers + layout changes, zh materialization in HBM).
# This kernel does the WHOLE analysis per tile of T=128 lane-major columns:
#
#   1. window start per column by rank: start = clip(#\{obs_x <= grid_x\}
#      - nb/2, 0, o - nb)  (a [o, T] compare + sublane-sum — the
#      searchsorted replacement; obs_x must be sorted),
#   2. for each window slot n: a one-hot [o, T] mask selects obs_x, the
#      normalized innovation, and the perturbation column (an MXU
#      contraction perts[k, o] @ onehot[o, T]),
#   3. Gaspari-Cohn taper on |obs_x - grid_x| (polynomials inline,
#      pytassim/localization/gaspari_cohn.py:77-95), sqrt-weight scaling,
#   4. the Chebyshev/Clenshaw solve + weight application of
#      letkf_nbh_analysis_cheb.
#
# Inputs stay in their natural layouts; the only HBM traffic is the state
# tile in/out and the (small) obs arrays once per tile.


def _taper_poly(z, taper: str, epsilon: float):
    """Gaspari-Cohn taper on normalized distances ``z = |dx| / radius``,
    branch-free, sub-epsilon cut to exact zero. The piecewise polynomials are
    the class statics of :mod:`tpu_assim.ops.localization` (single source of
    truth; reference: pytassim/localization/gaspari_cohn.py:77-95 for
    GC(z,1/2,c), :175-214 for GC(z,inf,c))."""
    from tpu_assim.ops.localization import GaspariCohn, GaspariCohnInf

    if taper == "gc2":
        z_safe = jnp.maximum(z, 0.5)  # keeps the 1/z term finite off-branch
        w = jnp.where(z < 2.0, GaspariCohn._f2(z_safe), 0.0)
        w = jnp.where(z < 1.0, GaspariCohn._f1(z), w)
    elif taper == "gcinf":
        z_safe = jnp.maximum(z, 0.25)
        w = jnp.where(z < 2.0, GaspariCohnInf._f4(z_safe), 0.0)
        w = jnp.where(z < 1.5, GaspariCohnInf._f3(z_safe), w)
        w = jnp.where(z < 1.0, GaspariCohnInf._f2(z_safe), w)
        w = jnp.where(z < 0.5, GaspariCohnInf._f1(z), w)
    else:
        raise ValueError(f"unknown taper {taper!r}; use 'gc2' or 'gcinf'")
    return jnp.where(w > epsilon, w, 0.0)


def _onehot_select(table, onehot, sel_prec: str):
    """The one-hot selection matmul ``table [r, o] @ onehot [o, nb*T]``.

    ``sel_prec="x3"`` (default): three native bf16 MXU passes over an
    EXACT 3-limb bf16 decomposition of the f32 table — BIT-EXACT here,
    not an approximation: each output element selects exactly ONE table
    entry (the one-hot is 0/1, exact in bf16), each limb rides through
    its pass unchanged, and the limbs recombine to the original f32 value
    (the two-sum residuals ``r1 = t - hi``, ``r2 = r1 - mid`` are exactly
    representable, and ``(hi + mid) + lo`` re-associates exactly because
    the limbs occupy disjoint significand ranges). Only accumulations of
    *multiple* nonzero products would need the 6-pass fp32 contract that
    ``"highest"`` requests (Mosaic lowers no intermediate precision) —
    half the MXU work of the selection stage for free. The table is
    clamped to the bf16 finite range first: the ±float32.max coordinate
    sentinels of the blocked paths would round to ±inf and poison the
    residual; the clamped sentinel (~3.39e38) still sits far outside
    every taper support. Verified bitwise-identical to "highest" on v5e
    (scripts/profile_window2d.py).
    """
    f32 = jnp.float32
    dims = (((1,), (0,)), ((), ()))
    if sel_prec == "highest":
        return jax.lax.dot_general(
            table, onehot, dims, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if sel_prec == "default":  # measurement only: rounds values to bf16
        return jax.lax.dot_general(
            table, onehot, dims, preferred_element_type=f32,
        )
    bf16 = jnp.bfloat16
    bmax = jnp.asarray(3.3895313892515355e38, f32)  # bf16 max finite
    tbl = jnp.clip(table, -bmax, bmax)
    t_hi = tbl.astype(bf16)
    r1 = tbl - t_hi.astype(f32)
    t_mid = r1.astype(bf16)
    t_lo = (r1 - t_mid.astype(f32)).astype(bf16)
    oh = onehot.astype(bf16)
    # one matmul with the limbs stacked along M: identical MACs to three
    # separate passes, but the stationary one-hot operand is loaded once
    r = table.shape[0]
    limbs = jnp.concatenate([t_hi, t_mid, t_lo], axis=0)
    s3 = jax.lax.dot_general(limbs, oh, dims, preferred_element_type=f32)
    return (s3[:r] + s3[r:2 * r]) + s3[2 * r:]


def _letkf_window_kernel(scal_ref, nodes_ref, dct_ref, obs_ref,
                         gridx_ref, sp_ref, mean_ref, out_ref,
                         *, ens_size, degree, nb, epsilon, taper,
                         support_z, strict, acc_form=False,
                         sel_prec="x3"):
    # packed obs table [1, rows_pad, o] fully in VMEM: rows 0..k-1 perts,
    # k innov, k+1 obs coords (padding rows unused)
    _window1d_core(
        obs_ref[:][0], scal_ref, nodes_ref, dct_ref, gridx_ref, sp_ref,
        mean_ref, out_ref, ens_size=ens_size, degree=degree, nb=nb,
        epsilon=epsilon, taper=taper, support_z=support_z, strict=strict,
        acc_form=acc_form, sel_prec=sel_prec,
    )


def _letkf_window_dma_kernel(scal_ref, nodes_ref, dct_ref, offs_ref,
                             gridx_ref, sp_ref, mean_ref, pack_hbm,
                             out_ref, pack_vmem, sem,
                             *, o_b, ens_size, degree, nb, epsilon, taper,
                             support_z, strict, acc_form=False,
                             sel_prec="x3"):
    """DMA-blocked 1-D variant (the 2-D design of
    :func:`_letkf_window2d_dma_kernel` applied to sorted 1-D obs): the
    table lives ONCE in HBM, transposed ([o_pad, 128] — sublane slices
    only need 8-alignment), and each tile DMAs its ``o_b``-wide slice at
    ``offs_ref[0, t]`` instead of XLA materializing per-tile gather
    blocks. Table pad columns already carry +float32.max coords and zero
    values, and a slice may start up to 7 slots before the exact block
    offset (8-alignment) — extra REAL obs below only shift every in-block
    rank equally, so the clamped window selects the same observations."""
    t = pl.program_id(0)
    off = offs_ref[0, t].astype(jnp.int32)
    dma = pltpu.make_async_copy(
        pack_hbm.at[pl.ds(off, o_b), :], pack_vmem, sem
    )
    dma.start()
    dma.wait()
    _window1d_core(
        jnp.swapaxes(pack_vmem[:], 0, 1), scal_ref, nodes_ref, dct_ref,
        gridx_ref, sp_ref, mean_ref, out_ref, ens_size=ens_size,
        degree=degree, nb=nb, epsilon=epsilon, taper=taper,
        support_z=support_z, strict=strict, acc_form=acc_form,
        sel_prec=sel_prec,
    )


def _window1d_core(pack, scal_ref, nodes_ref, dct_ref,
                   gridx_ref, sp_ref, mean_ref, out_ref,
                   *, ens_size, degree, nb, epsilon, taper,
                   support_z, strict, acc_form=False,
                   sel_prec="x3"):
    f32 = jnp.float32
    reg = scal_ref[0]
    radius = scal_ref[1]
    k_rows = ens_size
    perts = pack[:k_rows]             # [k, o]
    innov = pack[k_rows:k_rows + 1]   # [1, o]
    obs_x = pack[k_rows + 1:k_rows + 2]  # [1, o]
    grid_x = gridx_ref[:]             # [1, T]
    sp = sp_ref[:]                    # [ns, k, T]
    n_obs = perts.shape[1]

    # 1. window starts by rank of grid_x among obs_x, clamped onto the
    # column's in-support index range [l, h) (obs within the taper support
    # |dx| < support_z * radius; the support range is contiguous in the
    # sorted coords). The clamp makes the window exact for ASYMMETRIC
    # in-support distributions too — a purely rank-centered start truncates
    # e.g. 12-left/2-right at nb=16 even though the total fits — and makes
    # "no column has more than nb in-support obs" the exact-iff condition,
    # which the strict guard below enforces loudly. Padded block slots
    # carry coords = +float32.max: above every support bound, rank-inert.
    ox_col = obs_x.reshape(-1, 1)                              # [o, 1]
    cmp = jnp.where(ox_col <= grid_x, 1.0, 0.0)                # [o, T]
    center = jnp.sum(cmp, axis=0)                              # [T]
    sup = jnp.asarray(support_z, f32) * radius
    low = jnp.sum(jnp.where(ox_col <= grid_x - sup, 1.0, 0.0), axis=0)
    high = jnp.sum(jnp.where(ox_col < grid_x + sup, 1.0, 0.0), axis=0)
    start = jnp.clip(center - (nb // 2), high - float(nb), low)
    start = jnp.clip(start, 0.0, float(n_obs - nb)).astype(jnp.int32)
    # Exactness guard: more in-support obs than window slots means the
    # selection truncates — poison exactly those columns (loud, never
    # silently wrong; host-side callers raise first, interface/letkf.py).
    overflow = (
        jnp.where(high - low > float(nb), jnp.nan, 0.0).astype(f32)
        if strict and n_obs > nb
        else jnp.zeros((), f32)
    )

    # 2-3. one-hot window selection for ALL nb slots in one shot: lanes are
    # (slot, column) pairs, so the nb MXU contractions fuse into ONE
    # [k, o] @ [o, nb*T] matmul and the masked sums into one reduction each
    # (iota must be integer on TPU)
    t_cols = grid_x.shape[1]
    iota_o = jax.lax.broadcasted_iota(jnp.int32, (n_obs, 1), 0)  # [o, 1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (nb, t_cols), 0)  # [nb, T]
    sel_all = (start[None, :] + slot).reshape(1, nb * t_cols)   # [1, nb*T]
    onehot = jnp.where(iota_o == sel_all, 1.0, 0.0)             # [o, nb*T]
    # ONE selection matmul for perts + innovation + obs coords: they are
    # consecutive rows of the packed table, and the MXU pads the row dim to
    # 128 anyway — the extra two rows ride along for free, replacing two
    # full-width VPU masked reductions
    sel = _onehot_select(
        pack[:ens_size + 2], onehot, sel_prec
    ).reshape(ens_size + 2, nb, t_cols)                         # [k+2,nb,T]
    zz = sel[:ens_size]                                         # [k, nb, T]
    yv = sel[ens_size]                                          # [nb, T]
    ox = sel[ens_size + 1]                                      # [nb, T]
    # Gaspari-Cohn taper on all slots (gc2 or gcinf, see _taper_poly)
    z = jnp.abs(ox - grid_x) / radius                           # [nb, T]
    w = _taper_poly(z, taper, epsilon)
    sw = jnp.sqrt(w)                                            # [nb, T]
    zzs = zz * sw[None, :, :]                                   # [k, nb, T]
    zh = jnp.swapaxes(zz, 0, 1) * sw[:, None, :]                # [nb, k, T]
    yh = yv * sw + overflow                                     # [nb, T]

    # 4. Chebyshev solve + apply (shared with _letkf_cheb_kernel)
    out_ref[:] = _cheb_solve_apply(
        nodes_ref[:], dct_ref[:], zh, yh, sp, mean_ref[:], reg,
        ens_size, degree, zzs=zzs, acc_form=acc_form,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ens_size", "nb", "degree", "tile", "interpret",
                     "epsilon", "obs_block", "taper", "strict", "sel_prec",
                     "block_mode"),
)
def letkf_window_analysis_fused(
    perts: jnp.ndarray,
    innov: jnp.ndarray,
    obs_x: jnp.ndarray,
    grid_x: jnp.ndarray,
    sp: jnp.ndarray,
    mean: jnp.ndarray,
    reg: jnp.ndarray,
    radius: float,
    ens_size: int,
    nb: int = 16,
    degree: int = 16,
    tile: int = 128,
    epsilon: float = 1e-5,
    obs_block: int = 0,
    taper: str = "gc2",
    strict: bool = True,
    sel_prec: str = "x3",
    block_mode: str = "dma",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """The complete 1-D-window LETKF analysis as ONE Pallas kernel.

    Parameters
    ----------
    perts : [k, o] R^{-1/2}-normalized obs-space perturbations.
    innov : [o] normalized innovations.
    obs_x : [o] obs coordinates, SORTED ascending.
    grid_x : [g] grid coordinates; must be ordered so that every tile of
        ``tile`` consecutive columns spans a contiguous coordinate range
        when ``obs_block`` kicks in (a globally sorted grid satisfies this).
    sp : [k, g] state perturbations — or [ns, k, g] for ns stacked
        (var, time) state slices sharing the obs-space solve; mean [g]
        (or [ns, g]) state mean.
    reg : scalar (K-1)/rho; radius : static Gaspari-Cohn radius.
    nb : window size. The window is rank-centered, then clamped onto the
        column's in-support index range — exact IFF every column has at
        most nb nonzero-taper obs (and obs are sorted); ``strict=True``
        (default) NaN-poisons any column violating that, so the kernel is
        never silently approximate. ``strict=False`` accepts the
        truncation-to-nearest (the standard LETKF obs-count bound).
    obs_block : per-tile obs block width. 0 = auto: the whole obs set when
        it fits VMEM, otherwise ``2 x`` the mean obs count per tile span
        plus ``2 nb`` margin. Each grid tile sees only its contiguous slice
        of the sorted obs — exact as long as no tile's coordinate span
        contains more than ``obs_block - 2 nb`` observations. Overflowing
        tiles and unsorted ``obs_x`` are NaN-poisoned (loud, never silently
        wrong); concrete-input callers should pass
        ``obs_block=required_obs_block(obs_x, grid_x, nb, tile)`` which is
        exact for any obs clustering.
    taper : ``"gc2"`` (Gaspari-Cohn GC(z,1/2,c), the default) or
        ``"gcinf"`` (GC(z,inf,c)) — see :func:`_taper_poly`.

    Returns analysis [k, g] (or [ns, k, g]).
    """
    k, o = perts.shape
    g = grid_x.shape[0]
    multi = sp.ndim == 3
    if not multi:
        sp = sp[None]
        mean = mean[None]
    f32 = jnp.float32
    n_tiles = -(-g // tile)
    pad = n_tiles * tile - g
    if pad:
        grid_x = jnp.pad(grid_x, ((0, pad),),
                         constant_values=grid_x[-1])
        sp = jnp.pad(sp, ((0, 0), (0, 0), (0, pad)))
        mean = jnp.pad(mean, ((0, 0), (0, pad)))
    scal = jnp.stack([reg.astype(f32),
                      jnp.asarray(radius, f32)]).reshape(2,)
    mean3 = mean.astype(f32)[:, None, :]
    # Exactness guard (traced-safe): unsorted obs coordinates would silently
    # select wrong windows — poison the whole output with NaN instead.
    # Concrete-input callers validate host-side (see required_obs_block).
    if o > 1:
        sorted_ok = jnp.all(obs_x[1:] >= obs_x[:-1])
        mean3 = mean3 + jnp.where(sorted_ok, 0.0, jnp.nan).astype(f32)

    if obs_block == 0:
        # Auto: per-tile blocking is a win whenever it shrinks the obs
        # table — the rank compare and the one-hot selection scale with the
        # table width (measured 2.27 -> 1.66 ms on the benchmark workload
        # going from the full table to blocks), and it is what makes the
        # kernel's VMEM footprint independent of the obs count.
        obs_block = min(o, 2 * ((o * tile) // max(g, 1)) + 2 * nb)
        obs_block = max(obs_block, 2 * nb)
        obs_block = -(-obs_block // 8) * 8  # sublane-align

    statics = (ens_size, nb, degree, tile, epsilon, min(obs_block, o),
               taper, strict, sel_prec, block_mode,
               _resolve_interpret(interpret))
    out = _window_call(
        perts.astype(f32), innov.astype(f32), obs_x.astype(f32),
        grid_x.astype(f32), sp.astype(f32), mean3, scal, statics,
    )
    out = out[:, :, :g]
    return out if multi else out[0]


def _window_pallas(perts, innov, obs_x, grid_x, sp, mean3, scal,
                   ens_size, nb, degree, tile, epsilon, obs_block, taper,
                   strict, sel_prec, block_mode, interpret):
    """The raw window-kernel pallas_call over padded f32 inputs
    (perts [k, o], innov [o], obs_x [o], grid_x [G], sp [ns, k, G],
    mean3 [ns, 1, G], G a multiple of tile)."""
    from tpu_assim.ops.localization import taper_support_z

    f32 = jnp.float32
    k, o = perts.shape
    gp = grid_x.shape[0]
    ns = sp.shape[0]
    n_tiles = gp // tile
    nodes, dct = _cheb_nodes_dct(degree)
    support_z = taper_support_z(taper, epsilon)
    kernel = functools.partial(
        _letkf_window_kernel, ens_size=ens_size, degree=degree, nb=nb,
        epsilon=epsilon, taper=taper, support_z=support_z, strict=strict,
        acc_form=not interpret,
        # interpret mode pins the fp32-contract selection: XLA's
        # allow_excess_precision elides the f32->bf16->f32 limb casts of
        # "x3", collapsing it to ONE lossy bf16 pass (~1e-1 errors);
        # Mosaic keeps the casts explicit, where "x3" is bit-exact
        sel_prec=("highest" if interpret else sel_prec),
    )
    dp1 = degree + 1
    rows = k + 2
    rows_pad = -(-rows // 8) * 8
    sup = jnp.asarray(support_z, obs_x.dtype) * scal[1]    # scal[1] = radius

    if block_mode == "dma" and obs_block < o and k + 2 > 126:
        # The DMA table stores [k perts | innov | coord] rows in the 128
        # lanes of the transposed table; k + 2 > 126 does not fit. Loud
        # (round-4 advisor finding: never a silent mode change): warn that
        # this shape takes the gather-block path instead.
        import logging

        logging.getLogger(__name__).warning(
            "block_mode='dma' needs ens_size + 2 <= 126 rows in the "
            "transposed obs table (got ens_size=%d); falling back to "
            "XLA gather blocks (block_mode='gather') — identical "
            "results, more prologue HBM traffic.", k,
        )
        block_mode = "gather"
    if obs_block >= o:
        # single shared packed obs table, replicated to every tile
        pack = jnp.concatenate(
            [perts, innov[None, :], obs_x[None, :],
             jnp.zeros((rows_pad - rows, o), f32)], axis=0,
        )[None]                                            # [1, rows_pad, o]
        pack_idx = lambda i: (0, 0, 0)
        o_b = o
    elif block_mode == "dma":
        # DMA-blocked path (see _letkf_window_dma_kernel): one transposed
        # HBM table + per-tile slice offsets, no XLA gather blocks
        big = jnp.asarray(jnp.finfo(f32).max, f32)
        o_b = obs_block + 8                   # 8-aligned-offset headroom
        o_pad = max(-(-o // 8) * 8, o_b)
        tile_min = grid_x.reshape(n_tiles, tile).min(axis=1)
        offs = jnp.minimum(
            jnp.searchsorted(obs_x, tile_min, method="sort") - nb,
            jnp.searchsorted(obs_x, tile_min - sup, side="right",
                             method="sort"),
        )
        offs = jnp.clip(offs, 0, max(o - 1, 0)).astype(jnp.int32)
        tile_max = grid_x.reshape(n_tiles, tile).max(axis=1)
        rank_hi = jnp.searchsorted(obs_x, tile_max, side="right",
                                   method="sort")
        end_needed = jnp.maximum(
            jnp.clip(rank_hi, 0, max(o - nb, 0)) + nb,
            jnp.searchsorted(obs_x, tile_max + sup, method="sort"),
        )
        # same loud exactness guard as the gather path (vs the exact
        # block width; the +8 slice headroom is never counted on)
        bad_tile = (end_needed - offs) > obs_block
        mean3 = mean3 + jnp.where(
            jnp.repeat(bad_tile, tile), jnp.nan, 0.0
        ).astype(f32)[None, None, :]
        off8 = jnp.minimum(offs, o_pad - o_b)
        off8 = off8 - off8 % 8
        cpad = o_pad - o
        table_t = jnp.concatenate(
            [jnp.pad(perts, ((0, 0), (0, cpad))),
             jnp.pad(innov[None, :], ((0, 0), (0, cpad))),
             jnp.pad(obs_x[None, :], ((0, 0), (0, cpad)),
                     constant_values=big),
             jnp.zeros((128 - rows, o_pad), f32)],
            axis=0,
        ).T                                                # [o_pad, 128]
        dma_kernel = functools.partial(
            _letkf_window_dma_kernel, o_b=o_b, ens_size=ens_size,
            degree=degree, nb=nb, epsilon=epsilon, taper=taper,
            support_z=support_z, strict=strict, acc_form=not interpret,
            sel_prec=("highest" if interpret else sel_prec),
        )
        return pl.pallas_call(
            dma_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, dp1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dp1, dp1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),    # offs [1, T]
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ns, 1, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),     # table
            ],
            out_specs=pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ns, k, gp), f32),
            scratch_shapes=[pltpu.VMEM((o_b, 128), f32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(scal, jnp.asarray(nodes)[None, :], jnp.asarray(dct),
          off8[None, :].astype(f32), grid_x[None, :], sp, mean3, table_t)
    else:
        # Per-tile contiguous obs blocks (sorted obs => each tile's window
        # obs live in one slice; the block also spans every column's full
        # taper-support range so the kernel's in-block support counts are
        # globally exact). Out-of-range slots: coords +inf (never counted
        # by the rank, taper weight 0), values 0.
        o_b = obs_block
        tile_min = grid_x.reshape(n_tiles, tile).min(axis=1)
        offs = jnp.minimum(
            jnp.searchsorted(obs_x, tile_min, method="sort") - nb,
            jnp.searchsorted(obs_x, tile_min - sup, side="right",
                             method="sort"),
        )
        offs = jnp.clip(offs, 0, max(o - 1, 0)).astype(jnp.int32)
        # Exactness guard: a tile whose block cannot fit its columns'
        # windows + support ranges would silently drop observations —
        # NaN-poison those tiles (loud). ``required_obs_block`` computes
        # the exact width host-side for concrete callers.
        tile_max = grid_x.reshape(n_tiles, tile).max(axis=1)
        rank_hi = jnp.searchsorted(obs_x, tile_max, side="right",
                                   method="sort")
        end_needed = jnp.maximum(
            jnp.clip(rank_hi, 0, max(o - nb, 0)) + nb,
            jnp.searchsorted(obs_x, tile_max + sup, method="sort"),
        )
        bad_tile = (end_needed - offs) > o_b                 # [n_tiles]
        mean3 = mean3 + jnp.where(
            jnp.repeat(bad_tile, tile), jnp.nan, 0.0
        ).astype(f32)[None, None, :]
        idx = offs[:, None] + jnp.arange(o_b, dtype=jnp.int32)[None, :]
        in_range = idx < o
        idx_c = jnp.minimum(idx, o - 1)
        big = jnp.asarray(jnp.finfo(f32).max, f32)
        obs_x_b = jnp.where(in_range, jnp.take(obs_x, idx_c),
                            big)                           # [n_tiles, o_b]
        innov_b = jnp.where(in_range, jnp.take(innov, idx_c), 0.0)
        perts_b = jnp.where(
            in_range[:, None, :],
            jnp.take(perts, idx_c, axis=1).transpose(1, 0, 2),
            0.0,
        )                                                  # [n_tiles, k, o_b]
        pack = jnp.concatenate(
            [perts_b, innov_b[:, None, :], obs_x_b[:, None, :],
             jnp.zeros((n_tiles, rows_pad - rows, o_b), f32)], axis=1,
        )                                                  # [n_tiles, rp, o_b]
        pack_idx = lambda i: (i, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_pad, o_b), pack_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, k, gp), f32),
        # vmem_limit raised for high auto-degrees (see _cheb_pallas)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, jnp.asarray(nodes)[None, :], jnp.asarray(dct),
      pack, grid_x[None, :], sp, mean3)


def _window_analysis_ref(perts, innov, obs_x, grid_x, sp, mean3, scal, *,
                         ens_size, nb, degree, epsilon, taper):
    """Plain-XLA reference of the window kernel's math (unblocked): the
    same rank-based window selection, taper, scaling, and Chebyshev
    solve+apply — used as the differentiable backward of
    :func:`letkf_window_analysis_fused` (see :func:`_cheb_call`)."""
    from tpu_assim.ops.localization import safe_sqrt, taper_support_z

    reg = scal[0]
    radius = scal[1]
    o = obs_x.shape[0]
    rank = jnp.searchsorted(obs_x, grid_x, side="right", method="sort")
    # mirror of the kernel's support-clamped window placement
    sup = jnp.asarray(taper_support_z(taper, epsilon), obs_x.dtype) * radius
    low = jnp.searchsorted(obs_x, grid_x - sup, side="right", method="sort")
    high = jnp.searchsorted(obs_x, grid_x + sup, method="sort")
    start = jnp.clip(rank - nb // 2, high - nb, low)
    start = jnp.clip(start, 0, max(o - nb, 0))
    idx = start[:, None] + jnp.arange(nb, dtype=start.dtype)[None, :]
    ox = obs_x[idx]                                        # [G, nb]
    z = jnp.abs(ox - grid_x[:, None]) / radius
    w = _taper_poly(z, taper, epsilon)                     # [G, nb]
    sw = safe_sqrt(w)
    zh = perts[:, idx].transpose(2, 0, 1) * sw.T[:, None, :]  # [nb, k, G]
    yh = innov[idx].T * sw.T                                  # [nb, G]
    nodes, dct = _cheb_nodes_dct(degree)
    return _cheb_solve_apply(
        jnp.asarray(nodes), jnp.asarray(dct), zh, yh, sp, mean3, reg,
        ens_size, degree,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _window_call(perts, innov, obs_x, grid_x, sp, mean3, scal, statics):
    """Differentiable wrapper: Pallas forward, plain-XLA reverse over
    :func:`_window_analysis_ref` (gradients w.r.t. all array inputs incl.
    the coordinates through the taper; the integer window selection is
    piecewise constant). Same gradient-consistency note as
    :func:`_cheb_call`."""
    return _window_pallas(perts, innov, obs_x, grid_x, sp, mean3, scal,
                          *statics)


def _window_call_fwd(perts, innov, obs_x, grid_x, sp, mean3, scal, statics):
    out = _window_call(perts, innov, obs_x, grid_x, sp, mean3, scal, statics)
    return out, (perts, innov, obs_x, grid_x, sp, mean3, scal)


def _window_call_bwd(statics, res, g):
    (ens_size, nb, degree, _tile, epsilon, _obs_block, taper, _strict,
     _sel_prec, _block_mode, _interp) = statics
    perts, innov, obs_x, grid_x, sp, mean3, scal = res

    def ref(p_, i_, ox_, gx_, sp_, m_, sc_):
        return _window_analysis_ref(
            p_, i_, ox_, gx_, sp_, m_, sc_, ens_size=ens_size, nb=nb,
            degree=degree, epsilon=epsilon, taper=taper,
        )

    _, vjp = jax.vjp(ref, perts, innov, obs_x, grid_x, sp, mean3, scal)
    return vjp(g)


_window_call.defvjp(_window_call_fwd, _window_call_bwd)


# ---------------------------------------------------------------------------
# Monolithic 2-D-window kernel
# ---------------------------------------------------------------------------
#
# 2-D domains get the monolithic path through a two-level selection:
#
#   prologue (XLA): obs are sorted by y; each grid tile's candidate block is
#     the contiguous y-sorted slice inside the tile's y-band
#     [min(gy) - 2 ry, max(gy) + 2 ry] (the Gaspari-Cohn support along y);
#   kernel: the 1-D rank/window/one-hot machinery runs on the block's x
#     coordinates — selection is by in-block x-RANK (computed in-kernel
#     with index tie-break), so the block needs no x ordering and the
#     prologue never sorts per tile — and the taper is the per-dimension
#     product GC(|dx|/rx) * GC(|dy|/ry) (reference behavior:
#     pytassim/localization/gaspari_cohn.py:124-134), followed by the same
#     Chebyshev solve + apply.
#
# Exact when (a) the block holds the tile's whole y-band
# (required_obs_block_2d) and (b) no column has more than ``nb`` band obs
# inside its x-cutoff — the 2-D analog of the 1-D window condition. The
# grid ordering only affects efficiency (a row-major grid gives thin
# y-bands), never correctness: bands come from each tile's actual min/max.


def _letkf_window2d_kernel(scal_ref, nodes_ref, dct_ref, obs_ref,
                           grid_ref, sp_ref, mean_ref, out_ref,
                           *, ens_size, degree, nb, epsilon, taper,
                           support_z, strict, n_dims=2, acc_form=False,
                           sel_prec="x3"):
    # packed obs table [1, rows_pad, o_b] fully in VMEM (rows 0..k-1
    # perts, k innov, k+1 x coords, k+2 y coords, k+3.. extra dims);
    # out-of-band slots already carry x = +float32.max from the prologue
    _window2d_core(
        obs_ref[:][0], scal_ref, nodes_ref, dct_ref, grid_ref, sp_ref,
        mean_ref, out_ref, ens_size=ens_size, degree=degree, nb=nb,
        epsilon=epsilon, taper=taper, support_z=support_z, strict=strict,
        n_dims=n_dims, acc_form=acc_form, sel_prec=sel_prec,
    )


def _letkf_window2d_dma_kernel(scal_ref, nodes_ref, dct_ref, bands_ref,
                               grid_ref, sp_ref, mean_ref, pack_hbm,
                               out_ref, pack_vmem, sem,
                               *, o_b, ens_size, degree, nb, epsilon,
                               taper, support_z, strict, n_dims=2,
                               acc_form=False, sel_prec="x3"):
    """DMA-banded variant: the y-sorted obs table lives ONCE in HBM,
    TRANSPOSED ([o, rows_pad] — band slices ride the 8-aligned sublane
    dim; Mosaic rejects unaligned lane-dim slices); each tile DMAs its
    band slice ``[off : off+o_b, :]`` into VMEM scratch here and
    transposes it once, instead of XLA materializing [n_tiles, rows, o_b]
    gather blocks (0.37 ms/call of pure prologue on the 128x128 benchmark
    config — and an O(n_tiles * o_b) HBM blow-up that forbids
    production-scale grids). ``bands_ref`` [3, n_tiles] f32 in SMEM holds
    (slice offset, band start, band end) per tile — f32 so the custom-VJP
    boundary differentiates cleanly; exact for indices < 2^24.

    Out-of-slice band masking: only the x coordinate row needs the
    +float32.max sentinel (it alone drives slot consumption — rank / low /
    high — and the taper's x factor); out-of-band slots keep their real y,
    which the y-taper factor already zeroes (|dy| > 2 ry for every column
    of the tile, by the band definition)."""
    f32 = jnp.float32
    t = pl.program_id(0)
    off = bands_ref[0, t].astype(jnp.int32)
    dma = pltpu.make_async_copy(
        pack_hbm.at[pl.ds(off, o_b), :], pack_vmem, sem
    )
    dma.start()
    dma.wait()
    pack = jnp.swapaxes(pack_vmem[:], 0, 1)    # [rows_pad, o_b]
    a_rel = bands_ref[1, t].astype(jnp.int32)
    b_rel = bands_ref[2, t].astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, o_b), 1)
    in_band = (iota >= a_rel) & (iota < b_rel)
    big = jnp.asarray(jnp.finfo(f32).max, f32)
    x_row = ens_size + 1
    obs_x_m = jnp.where(in_band, pack[x_row:x_row + 1], big)
    pack_m = jnp.concatenate(
        [pack[:x_row], obs_x_m, pack[x_row + 1:]], axis=0
    )
    _window2d_core(
        pack_m, scal_ref, nodes_ref, dct_ref, grid_ref, sp_ref,
        mean_ref, out_ref, ens_size=ens_size, degree=degree, nb=nb,
        epsilon=epsilon, taper=taper, support_z=support_z, strict=strict,
        n_dims=n_dims, acc_form=acc_form, sel_prec=sel_prec,
    )


def _window2d_core(pack, scal_ref, nodes_ref, dct_ref,
                   grid_ref, sp_ref, mean_ref, out_ref,
                   *, ens_size, degree, nb, epsilon, taper,
                   support_z, strict, n_dims=2, acc_form=False,
                   sel_prec="x3"):
    f32 = jnp.float32
    reg = scal_ref[0]
    rx = scal_ref[1]
    ry = scal_ref[2]
    k_rows = ens_size
    obs_x = pack[k_rows + 1:k_rows + 2]   # [1, o_b]
    gx = grid_ref[0:1]                    # [1, T]
    gy = grid_ref[1:2]                    # [1, T]
    sp = sp_ref[:]                        # [ns, k, T]
    n_obs = pack.shape[1]

    # window starts by rank of gx among the block's x coords, clamped onto
    # the column's x-support range [l, h) within the band (see the 1-D
    # kernel; band obs outside the x-cutoff consume no slots that way).
    # The block holds the tile's WHOLE y-band (or the tile is already
    # band-poisoned), so in-block counts are band-global; out-of-band pad
    # slots carry x = +float32.max and never enter any count. All counts
    # are order-independent (compare + sum), so the block needs NO x
    # ordering at all — selection is by in-block x-RANK, computed right
    # here (index tie-break gives a strict total order; the per-block
    # argsort + 4 gathers this replaces were 0.70 ms of the 2.43 ms
    # end-to-end on the 128x128 benchmark config, profile_window2d.py).
    ox_col = obs_x.reshape(-1, 1)                               # [o_b, 1]
    cmp = jnp.where(ox_col <= gx, 1.0, 0.0)                     # [o_b, T]
    center = jnp.sum(cmp, axis=0)                               # [T]
    sup = jnp.asarray(support_z, f32) * rx
    low = jnp.sum(jnp.where(ox_col <= gx - sup, 1.0, 0.0), axis=0)
    high = jnp.sum(jnp.where(ox_col < gx + sup, 1.0, 0.0), axis=0)
    start = jnp.clip(center - (nb // 2), high - float(nb), low)
    start = jnp.clip(start, 0.0, float(n_obs - nb)).astype(jnp.int32)
    # Exactness guard: more band obs inside the x-cutoff than window slots
    # means the selection truncates — poison exactly those columns.
    overflow = (
        jnp.where(high - low > float(nb), jnp.nan, 0.0).astype(f32)
        if strict and n_obs > nb
        else jnp.zeros((), f32)
    )

    t_cols = gx.shape[1]
    # in-block x-rank of every slot (strict total order; ties broken by
    # slot index): rank_i = #{x_j < x_i} + #{x_j == x_i, j < i}. Selecting
    # rank == start + n is bitwise-identical to selecting slot start + n
    # of the x-sorted block — same obs, same window order.
    ox_row = obs_x                                              # [1, o_b]
    lt = jnp.where(ox_row[0][:, None] < ox_col[:, 0][None, :], 1.0, 0.0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (n_obs, n_obs), 0)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (n_obs, n_obs), 1)
    eq_lo = jnp.where(
        (ox_row[0][:, None] == ox_col[:, 0][None, :]) & (iota_j < iota_i),
        1.0, 0.0,
    )
    rank = jnp.sum(lt + eq_lo, axis=0).astype(jnp.int32)        # [o_b]
    slot = jax.lax.broadcasted_iota(jnp.int32, (nb, t_cols), 0)
    sel_all = (start[None, :] + slot).reshape(1, nb * t_cols)
    onehot = jnp.where(rank[:, None] == sel_all, 1.0, 0.0)      # [o_b,nb*T]
    n_rows = ens_size + 1 + n_dims
    sel = _onehot_select(
        pack[:n_rows], onehot, sel_prec
    ).reshape(n_rows, nb, t_cols)                               # [rows,nb,T]
    zz = sel[:ens_size]                                         # [k, nb, T]
    yv = sel[ens_size]                                          # [nb, T]
    ox = sel[ens_size + 1]                                      # [nb, T]
    oy = sel[ens_size + 2]                                      # [nb, T]

    # per-dimension taper product, epsilon cut on the product (the
    # reference cuts the multiplied weights, gaspari_cohn.py:124-136)
    zx = jnp.abs(ox - gx) / rx
    zy = jnp.abs(oy - gy) / ry
    w = _taper_poly(zx, taper, 0.0) * _taper_poly(zy, taper, 0.0)
    for j in range(n_dims - 2):
        oz = sel[ens_size + 3 + j]                              # [nb, T]
        gz = grid_ref[2 + j:3 + j]                              # [1, T]
        zj = jnp.abs(oz - gz) / scal_ref[3 + j]
        w = w * _taper_poly(zj, taper, 0.0)
    w = jnp.where(w > epsilon, w, 0.0)
    sw = jnp.sqrt(w)
    zzs = zz * sw[None, :, :]                                   # [k, nb, T]
    zh = jnp.swapaxes(zz, 0, 1) * sw[:, None, :]                # [nb, k, T]
    yh = yv * sw + overflow                                     # [nb, T]

    out_ref[:] = _cheb_solve_apply(
        nodes_ref[:], dct_ref[:], zh, yh, sp, mean_ref[:], reg,
        ens_size, degree, zzs=zzs, acc_form=acc_form,
    )


@functools.partial(
    jax.jit,
    static_argnames=("radius_x", "radius_y", "ens_size", "nb", "degree",
                     "tile", "interpret", "epsilon", "obs_block", "taper",
                     "strict", "extra_radii", "sel_prec"),
)
def letkf_window_analysis_fused_2d(
    perts: jnp.ndarray,
    innov: jnp.ndarray,
    obs_xy: jnp.ndarray,
    grid_xy: jnp.ndarray,
    sp: jnp.ndarray,
    mean: jnp.ndarray,
    reg: jnp.ndarray,
    radius_x: float,
    radius_y: float,
    ens_size: int,
    obs_block: int,
    nb: int = 48,
    degree: int = 16,
    tile: int = 128,
    epsilon: float = 1e-5,
    taper: str = "gc2",
    strict: bool = True,
    extra_radii: tuple = (),
    sel_prec: str = "x3",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """The complete 2-D-window LETKF analysis as ONE Pallas kernel.

    Parameters
    ----------
    perts : [k, o] R^{-1/2}-normalized obs-space perturbations.
    innov : [o] normalized innovations.
    obs_xy : [o, d] obs (x, y, ...) coordinates — any order (sorted
        internally); d = 2 + len(extra_radii).
    grid_xy : [g, d] grid coordinates; order affects only efficiency (a
        row-major grid gives thin per-tile y-bands), never correctness.
    sp / mean : state perturbations / mean, [k, g] or [ns, k, g].
    reg : scalar (K-1)/rho; radius_x / radius_y : static per-dimension
        Gaspari-Cohn radii (the taper is the per-dimension product).
    obs_block : per-tile y-band block width — REQUIRED; pass
        :func:`required_obs_block_2d` (exact for concrete coordinates).
        Overflowing tiles are NaN-poisoned, never silently truncated.
    nb : x-window size inside the y-band block; exact IFF no column has
        more than ``nb`` band obs within its x-cutoff. ``strict=True``
        (default) NaN-poisons any violating column; ``strict=False``
        accepts the truncation-to-x-nearest.
    extra_radii : static radii for coordinate dims >= 3 (e.g. the COSMO
        vertical): those dims contribute product taper factors only — the
        two-level band/window selection stays on (y, x), so the exactness
        condition above is unchanged (and conservative: extra dims can
        only zero weights, never add in-support obs).

    Returns analysis [k, g] (or [ns, k, g]). Differentiable: the kernel
    carries a custom VJP (Pallas forward, plain-XLA Chebyshev reverse over
    :func:`_window2d_ref`); the block-building prologue is plain XLA.
    """
    k, o = perts.shape
    g = grid_xy.shape[0]
    n_dims = 2 + len(extra_radii)
    if obs_xy.shape[1] < n_dims or grid_xy.shape[1] < n_dims:
        raise ValueError(
            f"need {n_dims} coordinate columns for 2 windowed + "
            f"{len(extra_radii)} extra taper dims; got obs {obs_xy.shape}, "
            f"grid {grid_xy.shape}"
        )
    if obs_block <= 0:
        raise ValueError(
            "obs_block is required for the 2-D window kernel; compute it "
            "with required_obs_block_2d(obs_y, grid_y, radius_y, tile)"
        )
    multi = sp.ndim == 3
    if not multi:
        sp = sp[None]
        mean = mean[None]
    ns = sp.shape[0]
    f32 = jnp.float32
    n_tiles = -(-g // tile)
    pad = n_tiles * tile - g
    if pad:
        grid_xy = jnp.pad(grid_xy, ((0, pad), (0, 0)), mode="edge")
        sp = jnp.pad(sp, ((0, 0), (0, 0), (0, pad)))
        mean = jnp.pad(mean, ((0, 0), (0, pad)))
    mean3 = mean.astype(f32)[:, None, :]

    # sort obs by y (internal — no precondition on the input order)
    oy_order = jnp.argsort(obs_xy[:, 1])
    perts = perts[:, oy_order].astype(f32)
    innov = innov[oy_order].astype(f32)
    ox_all = obs_xy[oy_order, 0].astype(f32)
    oy_all = obs_xy[oy_order, 1].astype(f32)
    oz_all = [obs_xy[oy_order, 2 + j].astype(f32)
              for j in range(n_dims - 2)]
    gx = grid_xy[:, 0].astype(f32)
    gy = grid_xy[:, 1].astype(f32)

    o_b = min(obs_block, o)
    rows = k + 1 + n_dims
    rows_pad = -(-rows // 8) * 8
    if o_b >= o:
        # whole table per tile, shared pack — NO x ordering needed: the
        # kernel selects by in-block x-rank (computed there), so the
        # y-sorted order rides through as-is
        pack = jnp.concatenate(
            [perts, innov[None, :], ox_all[None, :],
             oy_all[None, :]]
            + [z[None, :] for z in oz_all]
            + [jnp.zeros((rows_pad - rows, o), f32)],
            axis=0,
        )[None]
    else:
        ty = gy.reshape(n_tiles, tile)
        lo = ty.min(axis=1) - 2.0 * radius_y
        hi = ty.max(axis=1) + 2.0 * radius_y
        iy0 = jnp.clip(
            jnp.searchsorted(oy_all, lo, method="sort"), 0, max(o - 1, 0)
        ).astype(jnp.int32)
        iy1 = jnp.searchsorted(oy_all, hi, side="right",
                               method="sort").astype(jnp.int32)
        # Exactness guard: band population beyond the block width would
        # silently drop in-support observations — NaN-poison those tiles.
        # Guard against o_b itself: the DMA slice is o_b + 8 wide but up
        # to 7 slots are lost to the 8-aligned offset rounding below, so
        # the +8 headroom is never counted on (round-4 advisor finding —
        # the previous ceil-128 "capacity" admitted bands wider than the
        # slice and b_rel's clip silently truncated them).
        bad_tile = (iy1 - iy0) > o_b
        mean3 = mean3 + jnp.where(
            jnp.repeat(bad_tile, tile), jnp.nan, 0.0
        ).astype(f32)[None, None, :]
        # DMA-banded path: the y-sorted table lives ONCE in HBM; each tile
        # DMAs its slice [off, off+o_bd) inside the kernel
        # (_letkf_window2d_dma_kernel) — no [n_tiles, rows, o_b] gather
        # blocks, no per-block x sort (rank-based selection needs neither;
        # together 0.7 + 0.37 ms/call on the 128x128 benchmark config).
        # The table is stored TRANSPOSED ([obs, rows]) so the band slices
        # ride the sublane dim: Mosaic requires lane-dim slice offsets and
        # widths 128-aligned even for HBM memrefs, but sublane slices only
        # need 8-alignment — offsets round down to 8 and the block width
        # carries +8 headroom. Pad slots: +float32.max coords (rank-inert,
        # taper 0), zero values.
        o_bd = o_b + 8
        o_pad = -(-o // 8) * 8
        big = jnp.asarray(jnp.finfo(f32).max, f32)
        cpad = o_pad - o
        off = jnp.minimum(iy0, max(o_pad - o_bd, 0)).astype(jnp.int32)
        off = off - off % 8
        a_rel = (iy0 - off).astype(f32)
        b_rel = jnp.clip(iy1 - off, 0, o_bd).astype(f32)
        # [3, n_tiles]: the minor dim of an SMEM window pads to 128,
        # so the tile-major [n_tiles, 3] layout would cost 512 B per tile
        # of SMEM (4 MB at production tile counts — over the 1 MB budget)
        bands = jnp.stack([off.astype(f32), a_rel, b_rel], axis=0)

        def padv(row, fill=0.0):
            return jnp.pad(row, ((0, 0), (0, cpad)), constant_values=fill)

        # the transposed table's lane dim (rows) must itself be a
        # 128-multiple — Mosaic treats any non-multiple lane extent as an
        # unaligned slice even when taken in full
        rows_dma = -(-rows_pad // 128) * 128
        pack_full_t = jnp.concatenate(
            [padv(perts), padv(innov[None, :]),
             padv(ox_all[None, :], big), padv(oy_all[None, :], big)]
            + [padv(z[None, :], big) for z in oz_all]
            + [jnp.zeros((rows_dma - rows, o_pad), f32)],
            axis=0,
        ).T                                                # [o_pad, rows_dma]
        scal = jnp.stack(
            [reg.astype(f32), jnp.asarray(radius_x, f32),
             jnp.asarray(radius_y, f32)]
            + [jnp.asarray(r, f32) for r in extra_radii]
        ).reshape(1 + n_dims,)
        grid2 = jnp.stack(
            [gx, gy] + [grid_xy[:, 2 + j].astype(f32)
                        for j in range(n_dims - 2)], axis=0)
        statics = (ens_size, nb, degree, tile, epsilon, taper, strict,
                   n_dims, sel_prec, o_bd, _resolve_interpret(interpret))
        out = _window2d_dma_call(pack_full_t, bands, grid2, sp.astype(f32),
                                 mean3, scal, statics)
        out = out[:, :, :g]
        return out if multi else out[0]

    scal = jnp.stack(
        [reg.astype(f32), jnp.asarray(radius_x, f32),
         jnp.asarray(radius_y, f32)]
        + [jnp.asarray(r, f32) for r in extra_radii]
    ).reshape(1 + n_dims,)
    grid2 = jnp.stack(
        [gx, gy] + [grid_xy[:, 2 + j].astype(f32)
                    for j in range(n_dims - 2)], axis=0)   # [d, G]
    statics = (ens_size, nb, degree, tile, epsilon, taper, strict, n_dims,
               sel_prec, _resolve_interpret(interpret))
    out = _window2d_call(pack, grid2, sp.astype(f32), mean3, scal, statics)
    out = out[:, :, :g]
    return out if multi else out[0]


def _window2d_pallas(pack, grid2, sp, mean3, scal,
                     ens_size, nb, degree, tile, epsilon, taper, strict,
                     n_dims, sel_prec, interpret):
    """The raw 2-D window pallas_call over prepared f32 inputs
    (pack [1 or n_tiles, rows_pad, o_b], grid2 [2, G], sp [ns, k, G],
    mean3 [ns, 1, G], G a multiple of tile)."""
    from tpu_assim.ops.localization import taper_support_z

    f32 = jnp.float32
    n_pack, rows_pad, o_b = pack.shape
    ns, k, gp = sp.shape
    n_tiles = gp // tile
    pack_idx = (lambda i: (0, 0, 0)) if n_pack == 1 else (
        lambda i: (i, 0, 0)
    )
    nodes, dct = _cheb_nodes_dct(degree)
    kernel = functools.partial(
        _letkf_window2d_kernel, ens_size=ens_size, degree=degree, nb=nb,
        epsilon=epsilon, taper=taper,
        support_z=taper_support_z(taper, epsilon), strict=strict,
        n_dims=n_dims, acc_form=not interpret,
        # interpret mode pins the fp32-contract selection: XLA's
        # allow_excess_precision elides the f32->bf16->f32 limb casts of
        # "x3", collapsing it to ONE lossy bf16 pass (~1e-1 errors);
        # Mosaic keeps the casts explicit, where "x3" is bit-exact
        sel_prec=("highest" if interpret else sel_prec),
    )
    dp1 = degree + 1
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_pad, o_b), pack_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_dims, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, k, gp), f32),
        # the [nb, nb, T] Clenshaw state at the 2-D nb (~48-64) exceeds the
        # default 16 MB scoped-vmem cap; the chip has far more (128 MB on
        # v5e) — raise the cap instead of shrinking the tile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(scal, jnp.asarray(nodes)[None, :], jnp.asarray(dct), pack, grid2,
      sp, mean3)


def _window2d_ref(pack, grid2, sp, mean3, scal, *, ens_size, nb, degree,
                  epsilon, taper, tile, n_dims=2):
    """Plain-XLA, tile-vmapped mirror of the 2-D window kernel's math —
    the differentiable backward of :func:`letkf_window_analysis_fused_2d`
    (the block-building prologue is already plain XLA outside the custom
    boundary, so its gathers/sorts differentiate for free)."""
    from tpu_assim.ops.localization import safe_sqrt

    reg = scal[0]
    rx = scal[1]
    ry = scal[2]
    ns, k, gp = sp.shape
    n_tiles = gp // tile
    gx = grid2[0].reshape(n_tiles, tile)
    gy = grid2[1].reshape(n_tiles, tile)
    gz = [grid2[2 + j].reshape(n_tiles, tile) for j in range(n_dims - 2)]
    spt = sp.reshape(ns, k, n_tiles, tile).transpose(2, 0, 1, 3)
    mt = mean3.reshape(ns, 1, n_tiles, tile).transpose(2, 0, 1, 3)
    packt = (
        jnp.broadcast_to(pack, (n_tiles,) + pack.shape[1:])
        if pack.shape[0] == 1 else pack
    )
    nodes, dct = _cheb_nodes_dct(degree)

    from tpu_assim.ops.localization import taper_support_z

    sup_z = taper_support_z(taper, epsilon)

    def one_tile(pk, gxt, gyt, gzt, spt_, mt_):
        # the kernel selects by in-block x-rank with index tie-break; the
        # positional selection below needs the block x-sorted, so sort
        # here (stable argsort = the same tie order; differentiable
        # gather) — blocks arrive in y-order from the prologue
        pk = pk[:, jnp.argsort(pk[ens_size + 1], stable=True)]
        obs_x = pk[ens_size + 1]                           # [o_b]
        o_b = obs_x.shape[0]
        rank = jnp.sum(
            jnp.where(obs_x[:, None] <= gxt[None, :], 1.0, 0.0), axis=0
        )
        # mirror of the kernel's support-clamped window placement
        sup = jnp.asarray(sup_z, obs_x.dtype) * rx
        low = jnp.sum(
            jnp.where(obs_x[:, None] <= gxt[None, :] - sup, 1.0, 0.0),
            axis=0,
        )
        high = jnp.sum(
            jnp.where(obs_x[:, None] < gxt[None, :] + sup, 1.0, 0.0),
            axis=0,
        )
        start = jnp.clip(rank - (nb // 2), high - float(nb), low)
        start = jnp.clip(start, 0.0, float(o_b - nb)).astype(jnp.int32)
        idx = start[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
        sel = pk[:ens_size + 1 + n_dims][:, idx]           # [rows, T, nb]
        zz = sel[:ens_size]
        yv = sel[ens_size]
        ox = sel[ens_size + 1]
        oy = sel[ens_size + 2]
        zx = jnp.abs(ox - gxt[:, None]) / rx
        zy = jnp.abs(oy - gyt[:, None]) / ry
        w = _taper_poly(zx, taper, 0.0) * _taper_poly(zy, taper, 0.0)
        for j in range(n_dims - 2):
            zj = jnp.abs(sel[ens_size + 3 + j]
                         - gzt[j][:, None]) / scal[3 + j]
            w = w * _taper_poly(zj, taper, 0.0)
        w = jnp.where(w > epsilon, w, 0.0)
        sw = safe_sqrt(w)                                  # [T, nb]
        zh = zz.transpose(2, 0, 1) * sw.T[:, None, :]      # [nb, k, T]
        yh = yv.T * sw.T                                   # [nb, T]
        return _cheb_solve_apply(
            jnp.asarray(nodes), jnp.asarray(dct), zh, yh, spt_, mt_, reg,
            ens_size, degree,
        )

    gz_arr = (jnp.stack(gz, axis=1) if gz
              else jnp.zeros((n_tiles, 0, tile), gx.dtype))
    out_t = jax.vmap(one_tile)(packt, gx, gy, gz_arr, spt, mt)  # [t,ns,k,T]
    return out_t.transpose(1, 2, 0, 3).reshape(ns, k, gp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _window2d_call(pack, grid2, sp, mean3, scal, statics):
    """Differentiable wrapper: Pallas forward, plain-XLA reverse over
    :func:`_window2d_ref` (same gradient-consistency note as
    :func:`_cheb_call`)."""
    return _window2d_pallas(pack, grid2, sp, mean3, scal, *statics)


def _window2d_call_fwd(pack, grid2, sp, mean3, scal, statics):
    out = _window2d_call(pack, grid2, sp, mean3, scal, statics)
    return out, (pack, grid2, sp, mean3, scal)


def _window2d_call_bwd(statics, res, g):
    (ens_size, nb, degree, tile, epsilon, taper, _strict, n_dims,
     _sel_prec, _interp) = statics
    pack, grid2, sp, mean3, scal = res

    def ref(pk, g2, sp_, m_, sc_):
        return _window2d_ref(pk, g2, sp_, m_, sc_, ens_size=ens_size,
                             nb=nb, degree=degree, epsilon=epsilon,
                             taper=taper, tile=tile, n_dims=n_dims)

    _, vjp = jax.vjp(ref, pack, grid2, sp, mean3, scal)
    return vjp(g)


_window2d_call.defvjp(_window2d_call_fwd, _window2d_call_bwd)


def _window2d_dma_pallas(pack_full, bands, grid2, sp, mean3, scal,
                         ens_size, nb, degree, tile, epsilon, taper,
                         strict, n_dims, sel_prec, o_b, interpret):
    """The DMA-banded 2-D window pallas_call: ``pack_full [o, rows_pad]``
    (transposed) stays in HBM and every tile DMAs its ``o_b``-wide band
    slice into VMEM scratch (see :func:`_letkf_window2d_dma_kernel`);
    ``bands [3, n_tiles]`` f32 rides in SMEM."""
    from tpu_assim.ops.localization import taper_support_z

    f32 = jnp.float32
    _o, rows_pad = pack_full.shape
    ns, k, gp = sp.shape
    n_tiles = gp // tile
    nodes, dct = _cheb_nodes_dct(degree)
    kernel = functools.partial(
        _letkf_window2d_dma_kernel, o_b=o_b, ens_size=ens_size,
        degree=degree, nb=nb, epsilon=epsilon, taper=taper,
        support_z=taper_support_z(taper, epsilon), strict=strict,
        n_dims=n_dims, acc_form=not interpret,
        # interpret mode pins the fp32-contract selection: XLA's
        # allow_excess_precision elides the f32->bf16->f32 limb casts of
        # "x3", collapsing it to ONE lossy bf16 pass (~1e-1 errors);
        # Mosaic keeps the casts explicit, where "x3" is bit-exact
        sel_prec=("highest" if interpret else sel_prec),
    )
    dp1 = degree + 1
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp1, dp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),        # bands
            pl.BlockSpec((n_dims, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),         # pack_full
            # (explicit HBM, untiled: an ANY ref gets promoted to tiled
            # VMEM when it fits, and tiled sources reject the unaligned
            # o_b-wide band slices this kernel DMAs)
        ],
        out_specs=pl.BlockSpec((ns, k, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, k, gp), f32),
        scratch_shapes=[pltpu.VMEM((o_b, rows_pad), f32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(scal, jnp.asarray(nodes)[None, :], jnp.asarray(dct), bands, grid2,
      sp, mean3, pack_full)


def _window2d_dma_ref(pack_full, bands, grid2, sp, mean3, scal, *,
                      ens_size, nb, degree, epsilon, taper, tile, n_dims,
                      o_b):
    """Plain-XLA mirror of the DMA-banded kernel (the differentiable
    backward): materialize each tile's band slice (transposed-table
    layout) + x sentinel mask, then reuse :func:`_window2d_ref`."""
    f32 = jnp.float32
    rows_pad = pack_full.shape[1]
    big = jnp.asarray(jnp.finfo(f32).max, f32)
    x_row = ens_size + 1

    def slice_tile(band):
        off = band[0].astype(jnp.int32)
        blk = jax.lax.dynamic_slice(pack_full, (off, 0), (o_b, rows_pad)).T
        iota = jnp.arange(o_b, dtype=f32)
        inb = (iota >= band[1]) & (iota < band[2])
        xm = jnp.where(inb, blk[x_row], big)
        return jnp.concatenate(
            [blk[:x_row], xm[None, :], blk[x_row + 1:]], axis=0
        )

    packt = jax.vmap(slice_tile)(bands.T)
    return _window2d_ref(packt, grid2, sp, mean3, scal,
                         ens_size=ens_size, nb=nb, degree=degree,
                         epsilon=epsilon, taper=taper, tile=tile,
                         n_dims=n_dims)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _window2d_dma_call(pack_full, bands, grid2, sp, mean3, scal, statics):
    """Differentiable wrapper of the DMA-banded kernel: Pallas forward,
    plain-XLA reverse over :func:`_window2d_dma_ref` (``bands`` is f32 so
    the boundary differentiates cleanly; its cotangent is zero — band
    indices are piecewise constant in every input)."""
    return _window2d_dma_pallas(pack_full, bands, grid2, sp, mean3, scal,
                                *statics)


def _window2d_dma_call_fwd(pack_full, bands, grid2, sp, mean3, scal,
                           statics):
    out = _window2d_dma_call(pack_full, bands, grid2, sp, mean3, scal,
                             statics)
    return out, (pack_full, bands, grid2, sp, mean3, scal)


def _window2d_dma_call_bwd(statics, res, g):
    (ens_size, nb, degree, tile, epsilon, taper, _strict, n_dims,
     _sel_prec, o_b, _interp) = statics
    pack_full, bands, grid2, sp, mean3, scal = res

    def ref(pk, bd, g2, sp_, m_, sc_):
        return _window2d_dma_ref(pk, bd, g2, sp_, m_, sc_,
                                 ens_size=ens_size, nb=nb, degree=degree,
                                 epsilon=epsilon, taper=taper, tile=tile,
                                 n_dims=n_dims, o_b=o_b)

    _, vjp = jax.vjp(ref, pack_full, bands, grid2, sp, mean3, scal)
    return vjp(g)


_window2d_dma_call.defvjp(_window2d_dma_call_fwd, _window2d_dma_call_bwd)
