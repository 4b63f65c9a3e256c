"""
Fused, fully-jitted analysis steps.

The reference's hot path crosses xarray -> dask -> numpy -> torch per grid
chunk (/root/reference/pytassim/interface/letkf.py:127-143, wrapper.py:29-63).
Here the complete analysis — obs-operator application, R^{-1/2}
normalization, innovation, Gaspari-Cohn taper, batched weight solve, and
weight application — is one jitted XLA program with zero host round-trips.
These entry points power bench.py and the cycled-DA experiments; the
class-based interface layer (:mod:`tpu_assim.interface`) offers the same math
with the reference's flexible object API.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_assim.interface.mixin_local import map_grid_chunked
from tpu_assim.ops.etkf import (
    letkf_weights_dense,
    letkf_weights_nbh,
    etkf_weights,
)
from tpu_assim.ops.localization import (
    neighborhood_select,
    neighborhood_select_window,
)

__all__ = ["make_letkf_analysis", "make_etkf_analysis", "make_cycle_step"]


def _normalized_obs_space(ens_obs, obs_vals, obs_var):
    """R^{-1/2} normalization of innovations and obs-space perturbations.

    ens_obs [k, o], obs_vals [o], obs_var [o] (diagonal) or [o, o] (full
    correlated covariance) -> (perts [k, o], innov [o]).

    The correlated case whitens by the Cholesky factor (triangular solve,
    never an explicit inverse) — the reference's uniform ``mul_rcinv``
    contract (observation.py:241-271) extended to the fast entry points, so
    every solver method (incl. the Pallas kernels, which consume the
    pre-whitened obs space) accepts a correlated R.
    """
    mean = jnp.mean(ens_obs, axis=0, keepdims=True)
    if obs_var.ndim == 2:
        from jax.scipy.linalg import solve_triangular

        chol = jnp.linalg.cholesky(obs_var)
        perts = solve_triangular(chol, (ens_obs - mean).T, lower=True).T
        innov = solve_triangular(chol, obs_vals - mean[0], lower=True)
        return perts, innov
    rcinv = 1.0 / jnp.sqrt(obs_var)
    perts = (ens_obs - mean) * rcinv
    innov = (obs_vals - mean[0]) * rcinv
    return perts, innov


def _raise_if_overflow(worst: int, max_obs: int) -> None:
    """Loud failure for the window kernels' exactness condition (VERDICT r2
    #3; reference exactness contract: wrapper.py:91-97)."""
    if worst > max_obs:
        raise ValueError(
            f"a grid column has {worst} in-support (nonzero-taper) "
            f"observations but max_obs={max_obs}: the window selection "
            f"would truncate. Raise max_obs to >= {worst} or pass "
            "max_obs_strict=False to accept truncation to the nearest "
            "observations."
        )


def make_letkf_analysis(
    localization,
    inf_factor: float = 1.0,
    chunksize: Optional[int] = None,
    obs_operator: Optional[Callable] = None,
    method: str = "eigh",
    newton_iters: int = 25,
    max_obs: Optional[int] = None,
    cheb_degree: int = 16,
    selection: str = "topk",
    obs_block: Optional[int] = None,
    max_obs_strict: bool = True,
    geometry: Optional[tuple] = None,
):
    """Build a jitted single-cycle LETKF analysis.

    Parameters
    ----------
    localization : taper object (or None).
    inf_factor : inflation rho.
    chunksize : grid columns per processing chunk (HBM bound).
    obs_operator : optional jnp callable ``[..., grid] -> [..., obs]``; by
        default observations are direct point observations selected by the
        ``obs_idx`` argument.
    method : solver path (see docs/solvers.md):
        ``"eigh"`` — exact eigendecomposition, reference-parity math and the
        differentiation-friendly f64 oracle path;
        ``"newton"`` — matmul-only Newton-Schulz (smooth gradients);
        ``"woodbury"`` — dual-space Newton-Schulz over obs neighborhoods;
        ``"pallas"`` — fused Woodbury solve+apply Pallas kernel;
        ``"cheb"`` — lane-major Chebyshev/Clenshaw Pallas kernel (needs
        ``max_obs``);
        ``"fused1d"`` — the whole analysis (window selection + GC taper +
        gather + solve + apply) as ONE Pallas kernel; requires sorted 1-D
        obs coordinates and a single-radius GaspariCohn localization. The
        TPU speed-of-light path.
        ``"fused2d"`` — the 2-D monolithic kernel (per-tile y-band obs
        blocks, in-block x-windows, per-dimension product taper); takes the
        first two coordinate columns, any obs order, one or two radii.
    newton_iters : Newton iteration count for the Newton/Woodbury paths.
    max_obs : if set, each grid column solves over only its ``max_obs``
        largest-taper-weight observations (exact whenever no column has more
        nonzero-weight obs than that — see
        :func:`tpu_assim.ops.localization.neighborhood_select`); otherwise
        the weighted Gram runs over the full obs vector.
    cheb_degree : Chebyshev degree for the ``cheb``/``fused1d`` kernels.
    selection : ``"topk"`` (general) or ``"window"`` (sorted 1-D obs
        coordinates; O(g*nb) instead of O(g*o) + top_k).
    obs_block : explicit per-tile obs block width for the window kernels
        (``required_obs_block`` / ``required_obs_block_2d``). With it set,
        the returned function is fully traceable (usable inside an outer
        jit, e.g. a cycled scan) — otherwise the block is computed
        host-side from concrete coordinates at call time.
    max_obs_strict : enforce the exactness condition of the fixed-size
        window selections loudly — concrete callers raise, traced callers
        NaN-poison, whenever a column has more in-support obs than
        ``max_obs``. False accepts truncation to the nearest
        (see :class:`tpu_assim.interface.LETKF`).
    geometry : optional concrete ``(obs_idx, grid_coords, obs_coords)``
        (``obs_idx`` None with an ``obs_operator``). Binds the obs network
        and grid as XLA constants: the returned function takes only
        ``(state_data, obs_vals, obs_var)`` and the whole selection
        prologue (tile extents, block offsets, gather indices) constant-
        folds at compile time — the cycled-DA fast path, where the
        geometry is fixed and only values change per cycle. Host-side
        exactness hardening runs once at build.

    Returns
    -------
    analysis_fn(state_data [k, g], obs_vals [o], obs_var, obs_idx [o],
                grid_coords [g, d], obs_coords [o, d]) -> analysis [k, g]

    ``obs_var`` is either a diagonal variance vector [o] or a full
    correlated covariance [o, o] (Cholesky-whitened inside — the
    reference's ``mul_rcinv`` contract on the fast path).

    The state here is the single-variable single-time ensemble matrix — the
    benchmark layout (reference: examples/benchmark_letkf.py:107-122). For
    the full 4-D state path use :class:`tpu_assim.interface.LETKF`.
    """

    def _select(grid_info, obs_info):
        if selection == "window":
            # exact for sorted 1-D obs coordinates (see
            # neighborhood_select_window); O(g*nb) instead of O(g*o)+top_k
            return neighborhood_select_window(
                localization, grid_info, obs_info, max_obs,
                strict=max_obs_strict,
            )
        return neighborhood_select(localization, grid_info, obs_info, max_obs)

    def _impl(state_data, obs_vals, obs_var, obs_idx, grid_coords,
              obs_coords, obs_block):
        if obs_operator is None:
            ens_obs = jnp.take(state_data, obs_idx, axis=-1)  # [k, o]
        else:
            ens_obs = obs_operator(state_data)
        perts, innov = _normalized_obs_space(ens_obs, obs_vals, obs_var)

        # localization info rows: time column 0 (zero here), then coords
        # (reference prepends analysis time, mixin_local.py:56-58)
        grid_info = jnp.concatenate(
            [jnp.zeros((grid_coords.shape[0], 1), grid_coords.dtype),
             grid_coords], axis=1,
        )
        obs_info = jnp.concatenate(
            [jnp.zeros((obs_coords.shape[0], 1), obs_coords.dtype),
             obs_coords], axis=1,
        )

        if method == "fused1d" and localization is not None and (
            max_obs is not None
        ):
            # The complete analysis as ONE Pallas kernel (selection by
            # sorted-coordinate window + GC taper + one-hot neighborhood
            # gather + Chebyshev solve + apply) — requires sorted 1-D obs
            # coordinates and a single-radius GaspariCohn taper
            # (ops/pallas/letkf.py:letkf_window_analysis_fused).
            from tpu_assim.ops.localization import GaspariCohnInf
            from tpu_assim.ops.pallas.letkf import (
                letkf_window_analysis_fused,
            )

            if not hasattr(localization, "radius"):
                raise TypeError(
                    "method='fused1d' needs a Gaspari-Cohn localization "
                    "(single radius); got {0}".format(type(localization))
                )
            radius_arr = np.atleast_1d(np.asarray(localization.radius))
            if radius_arr.size != 1:
                raise ValueError(
                    "method='fused1d' supports a single localization "
                    "radius; got {0}".format(radius_arr)
                )
            taper = (
                "gcinf" if isinstance(localization, GaspariCohnInf)
                else "gc2"
            )
            k = state_data.shape[0]
            reg = jnp.asarray((k - 1) / inf_factor, perts.dtype)
            mean = jnp.mean(state_data, axis=0)
            sp = state_data - mean[None, :]
            return letkf_window_analysis_fused(
                perts, innov, obs_coords[:, 0], grid_coords[:, 0], sp,
                mean, reg, float(radius_arr[0]), k,
                nb=max_obs, degree=cheb_degree, obs_block=obs_block,
                taper=taper, epsilon=float(localization.epsilon),
                strict=max_obs_strict,
            )

        if method == "fused2d" and localization is not None and (
            max_obs is not None
        ):
            # The complete 2-D analysis as ONE Pallas kernel: per-tile
            # y-band obs blocks, in-block x-windows, per-dimension product
            # taper (ops/pallas/letkf.py:letkf_window_analysis_fused_2d).
            from tpu_assim.ops.localization import GaspariCohnInf
            from tpu_assim.ops.pallas.letkf import (
                letkf_window_analysis_fused_2d,
            )

            n_dims = min(obs_coords.shape[1], grid_coords.shape[1])
            radii = np.atleast_1d(np.asarray(localization.radius,
                                             dtype=float))
            rx = float(radii[0])
            ry = float(radii[1] if radii.size > 1 else radii[-1])
            extra = tuple(
                float(radii[j] if j < radii.size else radii[-1])
                for j in range(2, n_dims)
            )
            taper = (
                "gcinf" if isinstance(localization, GaspariCohnInf)
                else "gc2"
            )
            k = state_data.shape[0]
            reg = jnp.asarray((k - 1) / inf_factor, perts.dtype)
            mean = jnp.mean(state_data, axis=0)
            sp = state_data - mean[None, :]
            return letkf_window_analysis_fused_2d(
                perts, innov, obs_coords[:, :n_dims],
                grid_coords[:, :n_dims], sp,
                mean, reg, rx, ry, k, obs_block=obs_block,
                nb=max_obs, degree=cheb_degree, taper=taper,
                epsilon=float(localization.epsilon),
                strict=max_obs_strict, extra_radii=extra,
            )

        if method == "cheb" and localization is not None and (
            max_obs is not None
        ):
            # Fastest fused path: Chebyshev/Clenshaw lane-major kernel —
            # the matrix functions are applied to single vectors per column
            # (ops/pallas/letkf.py:letkf_nbh_analysis_cheb).
            from tpu_assim.ops.pallas.letkf import letkf_nbh_analysis_cheb

            k = state_data.shape[0]
            reg = jnp.asarray((k - 1) / inf_factor, perts.dtype)
            mean = jnp.mean(state_data, axis=0)
            sp = state_data - mean[None, :]

            def cheb_chunk(gi_chunk, sp_chunk, mean_chunk):
                from tpu_assim.ops.localization import safe_sqrt

                idx, w_nbh = _select(gi_chunk, obs_info)
                sw = safe_sqrt(w_nbh).astype(perts.dtype)     # [c, nb]
                zh = perts[:, idx].transpose(2, 0, 1) * sw.T[:, None, :]
                yh = innov[idx].T * sw.T                      # [nb, c]
                return letkf_nbh_analysis_cheb(
                    zh, yh, sp_chunk, mean_chunk, reg, k,
                    degree=cheb_degree,
                )

            g = grid_info.shape[0]
            if chunksize is None or chunksize >= g:
                return cheb_chunk(grid_info, sp, mean)
            # sequential lax.map over grid chunks: bounds the gathered
            # neighborhood buffers ([chunk, nb, k]) for very large grids
            # (the reference's dask-chunk analog, letkf.py:121)
            n_chunks = -(-g // chunksize)
            pad = n_chunks * chunksize - g
            gi_p = jnp.pad(grid_info, ((0, pad), (0, 0)))
            sp_p = jnp.pad(sp, ((0, 0), (0, pad)))
            mean_p = jnp.pad(mean, ((0, pad),))
            out = jax.lax.map(
                lambda c: cheb_chunk(
                    gi_p.reshape(n_chunks, chunksize, -1)[c],
                    sp_p.reshape(k, n_chunks, chunksize)[:, c],
                    mean_p.reshape(n_chunks, chunksize)[c],
                ),
                jnp.arange(n_chunks),
            )  # [n_chunks, k, chunksize]
            return out.transpose(1, 0, 2).reshape(k, -1)[:, :g]

        if method == "pallas" and localization is not None and (
            max_obs is not None
        ):
            # Fully fused path: neighborhood gather in XLA, then a single
            # Pallas kernel does the whole solve + weight application with
            # one HBM round-trip (ops/pallas/letkf.py).
            from tpu_assim.ops.pallas.letkf import letkf_nbh_analysis_fused

            from tpu_assim.ops.localization import safe_sqrt

            idx, w_nbh = _select(grid_info, obs_info)
            sw = safe_sqrt(w_nbh).astype(perts.dtype)
            zh = perts[:, idx].transpose(1, 2, 0) * sw[:, :, None]
            yh = innov[idx] * sw
            mean = jnp.mean(state_data, axis=0)
            sp = state_data - mean[None, :]
            reg = jnp.asarray(
                (state_data.shape[0] - 1) / inf_factor, perts.dtype
            )
            out = letkf_nbh_analysis_fused(
                zh, yh, sp.T, mean, reg, state_data.shape[0],
                num_iters=newton_iters,
            )
            return out.T

        def chunk_fn(g_chunk):
            if localization is not None and max_obs is not None:
                idx, w_nbh = _select(g_chunk, obs_info)
                return letkf_weights_nbh(
                    perts, innov, idx, w_nbh.astype(perts.dtype),
                    jnp.asarray(inf_factor, dtype=perts.dtype),
                    method=method, newton_iters=newton_iters,
                )
            if localization is None:
                w_loc = jnp.ones(
                    (g_chunk.shape[0], obs_info.shape[0]), dtype=perts.dtype
                )
            else:
                w_loc = localization.taper_weights(g_chunk, obs_info).astype(
                    perts.dtype
                )
            return letkf_weights_dense(
                perts, innov, w_loc,
                jnp.asarray(inf_factor, dtype=perts.dtype),
                method=method, newton_iters=newton_iters,
            )

        weights = map_grid_chunked(chunk_fn, grid_info, chunksize)  # [g,k,k]
        mean = jnp.mean(state_data, axis=0, keepdims=True)
        state_perts = state_data - mean
        analysis = mean + jnp.einsum("kg,gkm->mg", state_perts, weights,
                                  precision=jax.lax.Precision.HIGHEST)
        return analysis

    _impl_jit = jax.jit(_impl, static_argnums=(6,))

    def _host_harden(obs_coords_np, grid_coords_np):
        """Host-side hardening for the window kernels on concrete
        coordinates: validate sortedness, compute the exact per-tile obs
        block (required_obs_block(_2d) — never drops observations,
        whatever the clustering), and enforce the in-support exactness
        condition loudly."""
        blk = obs_block if obs_block is not None else 0
        if obs_block is not None:
            return blk
        if method not in ("fused1d", "fused2d") or localization is None:
            return blk
        from tpu_assim.ops.localization import GaspariCohnInf

        taper_name = (
            "gcinf" if isinstance(localization, GaspariCohnInf) else "gc2"
        )
        eps = float(localization.epsilon)
        if method == "fused1d" and max_obs is not None:
            from tpu_assim.ops.pallas.letkf import (
                max_in_support_1d,
                required_obs_block,
            )

            ox = obs_coords_np[:, 0]
            if ox.shape[0] > 1 and np.any(ox[1:] < ox[:-1]):
                raise ValueError(
                    "method='fused1d' needs obs coordinates sorted "
                    "ascending along dimension 0"
                )
            radius = float(
                np.atleast_1d(np.asarray(localization.radius, float))[0]
            )
            blk = required_obs_block(
                ox, grid_coords_np[:, 0], max_obs,
                radius=radius, taper=taper_name, epsilon=eps,
            )
            if max_obs_strict:
                worst = max_in_support_1d(
                    ox, grid_coords_np[:, 0], radius,
                    taper=taper_name, epsilon=eps,
                )
                _raise_if_overflow(worst, max_obs)
        if method == "fused2d" and max_obs is not None:
            from tpu_assim.ops.pallas.letkf import (
                max_in_support_2d,
                required_obs_block_2d,
            )

            radii = np.atleast_1d(np.asarray(localization.radius,
                                             dtype=float))
            rx = float(radii[0])
            ry = float(radii[1] if radii.size > 1 else radii[0])
            blk = required_obs_block_2d(
                obs_coords_np[:, 1], grid_coords_np[:, 1], ry,
            )
            if max_obs_strict:
                worst = max_in_support_2d(
                    obs_coords_np[:, :2], grid_coords_np[:, :2], rx, ry,
                    taper=taper_name, epsilon=eps,
                )
                _raise_if_overflow(worst, max_obs)
        return blk

    if geometry is not None:
        # Static-geometry binding (cycled DA: the obs network and grid are
        # fixed across cycles while values change every cycle): the
        # coordinates and indices become XLA CONSTANTS in the trace, so
        # the whole selection prologue — tile extents, searchsorted block
        # offsets, gather indices, degree-independent index arithmetic —
        # constant-folds at compile time and each cycle pays kernel time
        # only. Host-side hardening runs once, here.
        g_idx, g_grid, g_obs = geometry
        g_grid = np.asarray(g_grid)
        g_obs = np.asarray(g_obs)
        blk_static = _host_harden(g_obs, g_grid)
        const_args = (
            jnp.asarray(np.asarray(g_idx)) if g_idx is not None else None,
            jnp.asarray(g_grid),
            jnp.asarray(g_obs),
        )

        @jax.jit
        def analysis_fn_static(state_data, obs_vals, obs_var):
            return _impl(state_data, obs_vals, obs_var, const_args[0],
                         const_args[1], const_args[2], blk_static)

        return analysis_fn_static

    def analysis_fn(state_data, obs_vals, obs_var, obs_idx, grid_coords,
                    obs_coords):
        # Host-side hardening whenever the coordinates are concrete
        # (direct calls). Under an outer jit the coordinates are tracers;
        # the 1-D kernel then uses its auto block and NaN-poisons any
        # overflowing tile instead of being silently wrong, while fused2d
        # requires a precomputed block.
        concrete = not isinstance(
            obs_coords, jax.core.Tracer
        ) and not isinstance(grid_coords, jax.core.Tracer)
        if obs_block is None and not concrete:
            if method == "fused2d" and localization is not None and (
                max_obs is not None
            ):
                raise ValueError(
                    "method='fused2d' under an outer jit needs the per-tile "
                    "obs block precomputed: build the analysis with "
                    "make_letkf_analysis(..., obs_block="
                    "required_obs_block_2d(...)) — or bind the geometry "
                    "(make_letkf_analysis(..., geometry=(obs_idx, "
                    "grid_coords, obs_coords)))"
                )
            blk = 0
        else:
            blk = _host_harden(
                np.asarray(obs_coords) if concrete else None,
                np.asarray(grid_coords) if concrete else None,
            ) if concrete else (obs_block if obs_block is not None else 0)
        return _impl_jit(state_data, obs_vals, obs_var, obs_idx,
                         grid_coords, obs_coords, blk)

    return analysis_fn


def make_etkf_analysis(inf_factor: float = 1.0,
                       obs_operator: Optional[Callable] = None):
    """Build a jitted global-ETKF analysis with the same signature as
    :func:`make_letkf_analysis` (grid/obs coords ignored)."""

    @jax.jit
    def analysis_fn(state_data, obs_vals, obs_var, obs_idx, grid_coords,
                    obs_coords):
        if obs_operator is None:
            ens_obs = jnp.take(state_data, obs_idx, axis=-1)
        else:
            ens_obs = obs_operator(state_data)
        perts, innov = _normalized_obs_space(ens_obs, obs_vals, obs_var)
        weights = etkf_weights(
            perts, innov[None, :], jnp.asarray(inf_factor, dtype=perts.dtype)
        )
        mean = jnp.mean(state_data, axis=0, keepdims=True)
        state_perts = state_data - mean
        analysis = mean + jnp.einsum("kg,km->mg", state_perts, weights,
                                  precision=jax.lax.Precision.HIGHEST)
        return analysis

    return analysis_fn


def make_cycle_step(
    integrator,
    n_int_steps: int,
    localization,
    inf_factor: float = 1.0,
    chunksize: Optional[int] = None,
    **analysis_opts,
):
    """Build a jitted forecast+analysis cycle step for a [k, g] ensemble:
    integrate every member ``n_int_steps`` steps, then run the LETKF analysis
    — the composition the reference's cycled experiments build by hand
    (SURVEY §3.5; examples/benchmark_letkf.py + RK4Integrator).

    ``analysis_opts`` pass through to :func:`make_letkf_analysis`
    (method / max_obs / selection / cheb_degree / geometry). With
    ``geometry=(obs_idx, grid_coords, obs_coords)`` (concrete — the cycled
    setting, where the obs network is fixed) the returned step takes only
    ``(state_data, obs_vals, obs_var)`` and the analysis prologue is
    constant-folded at compile time.

    Returns step(state_data, obs_vals, obs_var, obs_idx, grid_coords,
                 obs_coords) -> analysis [k, g] (first three args only
    when ``geometry`` is bound).
    """
    analyse = make_letkf_analysis(localization, inf_factor, chunksize,
                                  **analysis_opts)

    def _forecast(state_data):
        def body(s, _):
            return integrator.integrate(s), None

        forecast, _ = jax.lax.scan(body, state_data, None,
                                   length=n_int_steps)
        return forecast

    if analysis_opts.get("geometry") is not None:
        @jax.jit
        def step_static(state_data, obs_vals, obs_var):
            return analyse(_forecast(state_data), obs_vals, obs_var)

        return step_static

    @jax.jit
    def step(state_data, obs_vals, obs_var, obs_idx, grid_coords, obs_coords):
        return analyse(
            _forecast(state_data), obs_vals, obs_var, obs_idx, grid_coords,
            obs_coords
        )

    return step
