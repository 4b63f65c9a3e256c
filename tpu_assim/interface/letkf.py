"""
Localized ETKF (LETKF).

TPU-native rebuild of /root/reference/pytassim/interface/letkf.py:34-148
(Hunt et al. 2007): an independent ETKF solve per grid column with
spatially-localized observations.

The reference's hot loop is ``xr.apply_ufunc(..., vectorize=True,
dask='parallelized')`` — a Python-rate ``np.vectorize`` loop over grid points
inside each dask chunk (letkf.py:127-143), with ragged per-column obs subsets.
Here the whole grid runs as one (grid-chunked) batched computation: the
Gaspari-Cohn taper is evaluated for all (column, obs) pairs, and the per-column
solves become two large einsums + one batched K x K eigendecomposition on the
MXU (:func:`tpu_assim.ops.etkf.letkf_weights_dense`). Zero-weight observations
contribute exactly nothing to the Gram products, so the fixed-size weighted
formulation is numerically identical to the reference's ragged masking
(wrapper.py:86-99).
"""

import logging
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from tpu_assim.interface.etkf import ETKF
from tpu_assim.interface.mixin_local import DomainLocalizedMixin, map_grid_chunked
from tpu_assim.observation import Observation
from tpu_assim.ops.etkf import letkf_weights_dense
from tpu_assim.state import EnsembleState

__all__ = ["LETKF"]

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _letkf_solve(
    localization, chunksize, max_obs, selection, method, newton_iters,
    strict,
    ens_obs_perts, innovations, grid_info, obs_info, inf_factor,
):
    """Jitted localized solve; localization/chunksize/max_obs/selection/
    method are static config (hashable by identity/value), arrays are
    traced."""
    from tpu_assim.ops.etkf import letkf_weights_nbh
    from tpu_assim.ops.localization import (
        neighborhood_select,
        neighborhood_select_window,
    )

    def chunk_fn(grid_chunk):
        if localization is not None and max_obs is not None:
            # fixed-size obs neighborhoods (exact when no column has more
            # nonzero-taper obs than max_obs; ops/localization.py)
            if selection == "window":
                idx, w_nbh = neighborhood_select_window(
                    localization, grid_chunk, obs_info, max_obs,
                    strict=strict,
                )
            else:
                idx, w_nbh = neighborhood_select(
                    localization, grid_chunk, obs_info, max_obs
                )
            return letkf_weights_nbh(
                ens_obs_perts, innovations, idx,
                w_nbh.astype(ens_obs_perts.dtype), inf_factor,
                method=method, newton_iters=newton_iters,
            )
        if localization is None:
            w_loc = jnp.ones(
                (grid_chunk.shape[0], obs_info.shape[0]),
                dtype=ens_obs_perts.dtype,
            )
        else:
            w_loc = localization.taper_weights(grid_chunk, obs_info).astype(
                ens_obs_perts.dtype
            )
        return letkf_weights_dense(
            ens_obs_perts, innovations, w_loc, inf_factor,
            method=method, newton_iters=newton_iters,
        )

    return map_grid_chunked(chunk_fn, grid_info, chunksize)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _letkf_fused_analysis(
    localization, chunksize, max_obs, selection, method, cheb_degree,
    obs_block, taper, strict,
    ens_obs_perts, innovations, grid_info, obs_info, inf_factor, data,
):
    """Fused solve+apply: the full [v, t, k, g] analysis WITHOUT
    materializing the [g, k, k] weights — one obs-space Chebyshev solve per
    column shared across every (var, time) slice, per-slice Clenshaw
    application inside the Pallas kernel (the class-API route to the
    monolithic-kernel speed; same math as the reference's estimate + apply,
    interface/letkf.py:104-148 + base.py:256-278)."""
    from tpu_assim.ops.localization import (
        neighborhood_select,
        neighborhood_select_window,
    )
    from tpu_assim.ops.pallas.letkf import (
        letkf_nbh_analysis_cheb,
        letkf_window_analysis_fused,
    )

    v, t, k, g = data.shape
    dtype = ens_obs_perts.dtype
    flat = data.reshape(v * t, k, g)
    mean = jnp.mean(flat, axis=1)                       # [vt, g]
    sp = flat - mean[:, None, :]                        # [vt, k, g]
    reg = (k - 1) / jnp.asarray(inf_factor, dtype)

    if method == "fused1d":
        # monolithic window kernel: needs sorted 1-D obs coords (sorted by
        # _estimate_and_apply) and a single-radius Gaspari-Cohn taper
        import numpy as np

        radius = float(np.atleast_1d(np.asarray(localization.radius))[0])
        out = letkf_window_analysis_fused(
            ens_obs_perts, innovations, obs_info[:, 1], grid_info[:, 1],
            sp, mean, reg, radius, k,
            nb=max_obs, degree=cheb_degree, obs_block=obs_block,
            taper=taper, epsilon=float(localization.epsilon),
            strict=strict,
        )
        return out.reshape(v, t, k, g).astype(data.dtype)

    if method == "fused2d":
        # monolithic 2-D window kernel: per-dimension radii multiplied
        # (reference gaspari_cohn.py:124-134); obs sorted internally.
        # Coordinate dims beyond (x, y) — e.g. the COSMO vertical — ride
        # along as extra product taper factors (band/window stay on y/x).
        import numpy as np

        from tpu_assim.ops.pallas.letkf import (
            letkf_window_analysis_fused_2d,
        )

        n_dims = min(grid_info.shape[1], obs_info.shape[1]) - 1
        radii = np.atleast_1d(np.asarray(localization.radius, dtype=float))
        rx = float(radii[0])
        ry = float(radii[1] if radii.size > 1 else radii[-1])
        extra = tuple(
            float(radii[j] if j < radii.size else radii[-1])
            for j in range(2, n_dims)
        )
        out = letkf_window_analysis_fused_2d(
            ens_obs_perts, innovations, obs_info[:, 1:1 + n_dims],
            grid_info[:, 1:1 + n_dims],
            sp, mean, reg, rx, ry, k, obs_block=obs_block,
            nb=max_obs, degree=cheb_degree, taper=taper,
            epsilon=float(localization.epsilon), strict=strict,
            extra_radii=extra,
        )
        return out.reshape(v, t, k, g).astype(data.dtype)

    def cheb_chunk(gi_chunk, sp_chunk, mean_chunk):
        if selection == "window":
            idx, w_nbh = neighborhood_select_window(
                localization, gi_chunk, obs_info, max_obs, strict=strict
            )
        else:
            idx, w_nbh = neighborhood_select(
                localization, gi_chunk, obs_info, max_obs
            )
        from tpu_assim.ops.localization import safe_sqrt

        sw = safe_sqrt(w_nbh).astype(dtype)             # [c, nb]
        zh = ens_obs_perts[:, idx].transpose(2, 0, 1) * sw.T[:, None, :]
        yh = innovations[idx].T * sw.T                  # [nb, c]
        return letkf_nbh_analysis_cheb(
            zh, yh, sp_chunk, mean_chunk, reg, k, degree=cheb_degree,
        )                                               # [vt, k, c]

    if chunksize is None or chunksize >= g:
        out = cheb_chunk(grid_info, sp, mean)
    else:
        n_chunks = -(-g // chunksize)
        pad = n_chunks * chunksize - g
        gi_p = jnp.pad(grid_info, ((0, pad), (0, 0)), mode="edge")
        sp_p = jnp.pad(sp, ((0, 0), (0, 0), (0, pad)))
        mean_p = jnp.pad(mean, ((0, 0), (0, pad)))
        out = jax.lax.map(
            lambda c: cheb_chunk(
                gi_p.reshape(n_chunks, chunksize, -1)[c],
                sp_p.reshape(v * t, k, n_chunks, chunksize)[:, :, c],
                mean_p.reshape(v * t, n_chunks, chunksize)[:, c],
            ),
            jnp.arange(n_chunks),
        )  # [n_chunks, vt, k, chunksize]
        out = out.transpose(1, 2, 0, 3).reshape(v * t, k, -1)[:, :, :g]
    return out.reshape(v, t, k, g).astype(data.dtype)


class LETKF(DomainLocalizedMixin, ETKF):
    """Localized ensemble transform Kalman filter
    (reference: interface/letkf.py:34).

    Parameters
    ----------
    localization : :class:`~tpu_assim.ops.localization.BaseLocalization` or
        None (None = per-gridpoint ETKF without localization).
    inf_factor : multiplicative inflation rho.
    chunksize : grid columns per processing chunk (HBM bound); None = whole
        grid at once. The reference's dask ``chunksize`` analog
        (letkf.py:80,121).
    method : solver path (docs/solvers.md). Weight-based (materialize
        [g, k, k] weights, required for ``weight_save_path``): ``"eigh"``
        (exact, default), ``"newton"``, ``"woodbury"`` (obs-neighborhood
        only). Fused solve+apply fast paths (never materialize weights;
        require ``localization`` and ``max_obs``): ``"cheb"`` — the
        Chebyshev/Clenshaw Pallas kernel with the obs-space solve shared
        across all (var, time) state slices; ``"fused1d"`` — the monolithic
        window kernel (selection + taper + gather + solve + apply in one
        pallas_call; needs sorted 1-D obs coords and single-radius
        GaspariCohn).
    max_obs_strict : with the fused window paths (and window selection),
        raise / NaN-poison when any grid column has more in-support
        (nonzero-taper) observations than ``max_obs`` — the condition under
        which the fixed-size selection is EXACT. Default True (loud, never
        silently approximate). Set False to accept truncation to the
        nearest ``max_obs`` observations (the standard LETKF practice for
        bounding local obs counts; reference wrapper.py:91-97 masks
        ragged subsets instead).
    cheb_degree : Chebyshev degree for the fused paths. None (default) =
        auto: each ``assimilate()`` call measures a per-column spectral
        bound on the obs-space operator and picks the smallest degree whose
        Chebyshev truncation error is below 1e-6
        (:func:`tpu_assim.ops.pallas.letkf.cheb_degree_for`) — well-observed
        smoother windows automatically get the higher degree their
        conditioning needs. An explicit int pins the degree (the benchmark
        workload is validated at 12).
    n_strips : ``method="fused2d"`` only. None (default) = auto: wide 2-D
        grids (> ~512 distinct x values) are split into x-strips of ~256
        distinct x each and run through the single-kernel strip assembly
        (:func:`tpu_assim.analysis._strip_plan_2d` — the production path;
        the fused2d per-tile candidate band spans the whole domain width,
        so an unsplit wide grid pays selection cost linear in the x
        extent). An int pins the strip count; 1 disables splitting. The
        strip plan is built host-side per concrete geometry with the same
        loud exactness prechecks and cached across ``assimilate()`` calls.
    """

    def __init__(
        self,
        localization=None,
        inf_factor: float = 1.0,
        smoother: bool = False,
        pre_transform=None,
        post_transform=None,
        chunksize: Optional[int] = 8192,
        weight_save_path: Optional[str] = None,
        forward_model=None,
        max_obs: Optional[int] = None,
        selection: str = "topk",
        method: str = "eigh",
        newton_iters: int = 25,
        cheb_degree: Optional[int] = None,
        max_obs_strict: bool = True,
        n_strips: Optional[int] = None,
    ):
        super().__init__(
            inf_factor=inf_factor,
            smoother=smoother,
            pre_transform=pre_transform,
            post_transform=post_transform,
            weight_save_path=weight_save_path,
            forward_model=forward_model,
        )
        self.localization = localization
        self.chunksize = chunksize
        self.max_obs = max_obs
        self.selection = selection
        self.method = method
        self.newton_iters = newton_iters
        self.cheb_degree = cheb_degree
        self.max_obs_strict = max_obs_strict
        self.n_strips = n_strips
        self._strip_cache = None
        if method in ("cheb", "fused1d", "fused2d"):
            if localization is None or max_obs is None:
                raise ValueError(
                    "method={0!r} needs localization and max_obs".format(
                        method
                    )
                )
            if weight_save_path is not None:
                raise ValueError(
                    "method={0!r} never materializes the weight matrices; "
                    "use a weight-based method with weight_save_path".format(
                        method
                    )
                )
        if method in ("fused1d", "fused2d"):
            import numpy as np

            from tpu_assim.ops.localization import (
                GaspariCohn,
                GaspariCohnInf,
            )

            if not isinstance(localization, (GaspariCohn, GaspariCohnInf)):
                raise TypeError(
                    "method={0!r} needs a GaspariCohn or GaspariCohnInf "
                    "localization (the taper polynomials are inlined in the "
                    "kernel); got {1}".format(method, type(localization))
                )
            radius = np.atleast_1d(
                np.asarray(getattr(localization, "radius", None))
            )
            if radius[0] is None or (method == "fused1d"
                                     and radius.size > 1):
                raise ValueError(
                    "method={0!r} needs a single-radius localization for "
                    "1-D windows (fused2d takes any number of per-dim "
                    "radii); got {1}".format(method, radius)
                )

    def __str__(self):
        return "Localized ETKF(inf_factor={0}, loc={1})".format(
            self.inf_factor, str(self.localization)
        )

    def __repr__(self):
        return "LETKF({0},{1})".format(
            repr(self.inf_factor), repr(self.localization)
        )

    def estimate_weights(
        self,
        state: EnsembleState,
        filtered_obs: List[Observation],
        ens_obs: List[jnp.ndarray],
    ) -> jnp.ndarray:
        """(reference: interface/letkf.py:104-148)"""
        innovations, ens_obs_perts, obs_info = self._get_obs_space_variables(
            ens_obs, filtered_obs
        )
        grid_info = state.grid_info()
        method = self.method
        if method in ("cheb", "fused1d", "fused2d"):
            # direct estimate_weights calls on a fused-configured instance
            # still get exact weight matrices
            method = "eigh"
        return _letkf_solve(
            self.localization,
            self.chunksize,
            self.max_obs,
            self.selection,
            method,
            self.newton_iters,
            self.max_obs_strict,
            ens_obs_perts,
            innovations,
            grid_info,
            obs_info,
            jnp.asarray(self.inf_factor, dtype=ens_obs_perts.dtype),
        )

    def _auto_cheb_degree(
        self, ens_obs_perts, obs_info, grid_info
    ) -> int:
        """Chebyshev degree from a measured spectral bound.

        The solve operator per column is ``X = I + Zh Zh^T / reg`` with
        spectrum in ``[1, 1 + tr(S)/reg]``; ``tr(S) = sum_o w_o ||z_o||^2``
        with taper weights ``w <= 1``. For sorted-window selection the bound
        is the maximal ``max_obs``-consecutive-obs sum of ``||z_o||^2``
        (O(o) cumsum); for generic tapers it is ``max_c sum_o w_co
        ||z_o||^2`` evaluated chunked. The degree then follows from the
        Chebyshev convergence rate (:func:`cheb_degree_for`, tol=1e-6).
        """
        import numpy as np

        from tpu_assim.ops.pallas.letkf import cheb_degree_for

        k = ens_obs_perts.shape[0]
        reg = (k - 1) / float(self.inf_factor)
        znorm = jnp.sum(
            ens_obs_perts.astype(jnp.float32) ** 2, axis=0
        )  # [o]
        n_obs = int(znorm.shape[0])
        if self.method == "fused1d" or self.selection == "window":
            zs = znorm[jnp.argsort(obs_info[:, 1])]
            cs = jnp.concatenate(
                [jnp.zeros((1,), zs.dtype), jnp.cumsum(zs)]
            )
            width = min(self.max_obs, n_obs)
            tr_max = float(jnp.max(cs[width:] - cs[:-width]))
        else:
            tr = map_grid_chunked(
                lambda gi: self.localization.taper_weights(gi, obs_info)
                @ znorm.astype(jnp.float64),
                grid_info,
                self.chunksize,
            )
            tr_max = float(jnp.max(tr))
        return cheb_degree_for(1.0 + tr_max / reg)

    def _strip_assimilate(self, state, ens_obs_perts, innovations,
                          grid_info, obs_info, degree, n_strips):
        """fused2d via the x-strip decomposition (the production wide-grid
        path, :func:`tpu_assim.analysis._strip_plan_2d` /
        ``_strip_apply_2d``): geometry is concrete at ``assimilate()``
        time, so the strip plan (column permutation, multi-segment obs
        table, per-tile DMA bands) is built host-side with the same loud
        prechecks as ``make_strip_letkf_2d`` and the jitted apply is
        cached per (geometry, shape, degree)."""
        import hashlib

        import numpy as np

        from tpu_assim.analysis import _strip_apply_2d, _strip_plan_2d

        gxy = np.ascontiguousarray(np.asarray(grid_info[:, 1:3]))
        oxy = np.ascontiguousarray(np.asarray(obs_info[:, 1:3]))
        key = (
            n_strips, int(degree), tuple(state.data.shape),
            self.max_obs, self.max_obs_strict,
            hashlib.sha1(gxy.tobytes()).hexdigest(),
            hashlib.sha1(oxy.tobytes()).hexdigest(),
        )
        if self._strip_cache is None or self._strip_cache[0] != key:
            plan = _strip_plan_2d(
                self.localization, gxy, oxy, n_strips, self.max_obs,
                self.max_obs_strict,
            )

            @jax.jit
            def run(perts, innov, data, inf_factor):
                v, t, k, g = data.shape
                flat = data.reshape(v * t, k, g)
                mean = jnp.mean(flat, axis=1)
                sp = flat - mean[:, None, :]
                reg = (k - 1) / jnp.asarray(inf_factor, jnp.float32)
                out = _strip_apply_2d(plan, perts, innov, sp, mean, reg,
                                      degree)
                return out.reshape(v, t, k, g).astype(data.dtype)

            self._strip_cache = (key, run)
        analysis = self._strip_cache[1](
            ens_obs_perts, innovations, state.data,
            jnp.asarray(self.inf_factor, jnp.float32),
        )
        return state.replace(data=analysis)

    def _check_max_obs(self, worst: int) -> None:
        """Raise when a column's in-support obs count exceeds ``max_obs``
        (the fixed-size window selection would silently truncate — VERDICT
        r2 #3; reference exactness contract: wrapper.py:91-97, ragged
        subsets are exact)."""
        if worst > self.max_obs:
            raise ValueError(
                f"a grid column has {worst} in-support (nonzero-taper) "
                f"observations but max_obs={self.max_obs}: the window "
                f"selection would truncate. Raise max_obs to >= {worst}, "
                "widen the kernel budget, or pass max_obs_strict=False to "
                "accept truncation to the nearest observations."
            )

    def _estimate_and_apply(
        self,
        state: EnsembleState,
        filtered_obs: List[Observation],
        ens_obs: List[jnp.ndarray],
    ) -> EnsembleState:
        """Fused solve+apply for method='cheb'/'fused1d': the obs-space
        solve is shared across every (var, time) slice and the weights are
        never materialized — mathematically identical to estimate_weights +
        _apply_weights (one weight matrix per column applied to all slices,
        reference base.py:256-278).

        Host-side hardening (inputs are concrete here): stacked obs are
        sorted by coordinate for the window kernel (smoother-mode obs stacks
        repeat coordinates per time), the per-tile obs block width is
        computed exactly (never drops observations), and the Chebyshev
        degree adapts to the measured conditioning unless pinned.

        The kernels compute in float32; a float64 state is returned as
        float64 but carries f32 accuracy (~1e-6 relative) — use
        method='eigh' for the f64 oracle path.
        """
        if self.method not in ("cheb", "fused1d", "fused2d"):
            return super()._estimate_and_apply(state, filtered_obs, ens_obs)
        import numpy as np

        from tpu_assim.ops.localization import GaspariCohnInf
        from tpu_assim.ops.pallas.letkf import (
            max_in_support_1d,
            max_in_support_2d,
            required_obs_block,
            required_obs_block_2d,
        )

        innovations, ens_obs_perts, obs_info = self._get_obs_space_variables(
            ens_obs, filtered_obs
        )
        grid_info = state.grid_info()
        if state.dtype == jnp.float64 and not getattr(
            self, "_warned_f32", False
        ):
            logger.warning(
                "LETKF(method=%r) computes in float32; the float64 analysis "
                "carries f32 accuracy (~1e-6 relative). Use method='eigh' "
                "for the f64 oracle path.", self.method,
            )
            self._warned_f32 = True

        obs_block = 0
        taper = "gc2"
        if self.method in ("fused1d", "fused2d"):
            taper = (
                "gcinf"
                if isinstance(self.localization, GaspariCohnInf)
                else "gc2"
            )
        if self.method == "fused2d":
            radii = np.atleast_1d(
                np.asarray(self.localization.radius, dtype=float)
            )
            rx = float(radii[0])
            ry = float(radii[1] if radii.size > 1 else radii[0])
            obs_block = required_obs_block_2d(
                np.asarray(obs_info[:, 2]), np.asarray(grid_info[:, 2]), ry
            )
            if self.max_obs_strict:
                self._check_max_obs(max_in_support_2d(
                    np.asarray(obs_info[:, 1:3]),
                    np.asarray(grid_info[:, 1:3]), rx, ry, taper=taper,
                    epsilon=float(self.localization.epsilon),
                ))
        if self.method == "fused1d":
            radius = float(np.atleast_1d(
                np.asarray(self.localization.radius, dtype=float)
            )[0])
            obs_x = np.asarray(obs_info[:, 1])
            if obs_x.shape[0] > 1 and np.any(obs_x[1:] < obs_x[:-1]):
                # smoother-mode stacks repeat the spatial coordinates per
                # time; the window kernel needs them globally sorted (the
                # taper is time-blind, so sorting is exact)
                order = jnp.asarray(np.argsort(obs_x, kind="stable"))
                innovations = innovations[order]
                ens_obs_perts = ens_obs_perts[:, order]
                obs_info = obs_info[order]
                obs_x = obs_x[np.asarray(order)]
            obs_block = required_obs_block(
                obs_x, np.asarray(grid_info[:, 1]), self.max_obs,
                radius=radius, taper=taper,
                epsilon=float(self.localization.epsilon),
            )
            if self.max_obs_strict:
                self._check_max_obs(max_in_support_1d(
                    obs_x, np.asarray(grid_info[:, 1]), radius, taper=taper,
                    epsilon=float(self.localization.epsilon),
                ))
        degree = self.cheb_degree
        if degree is None:
            degree = self._auto_cheb_degree(
                ens_obs_perts, obs_info, grid_info
            )
            logger.debug("auto cheb_degree=%d", degree)

        if self.method == "fused2d":
            n_dims = min(grid_info.shape[1], obs_info.shape[1]) - 1
            n_strips = self.n_strips
            if n_strips is None and n_dims == 2:
                # auto: the fused2d per-tile candidate band spans the
                # whole domain width, so its selection cost grows with
                # the grid's x extent — split wide grids into
                # ~256-distinct-x strips (make_strip_letkf_2d's
                # decomposition, reachable straight from the class API)
                n_strips = max(
                    1, np.unique(np.asarray(grid_info[:, 1])).size // 256
                )
            if n_strips and n_strips > 1 and n_dims == 2:
                logger.debug("fused2d x-strips: n_strips=%d", n_strips)
                return self._strip_assimilate(
                    state, ens_obs_perts, innovations, grid_info,
                    obs_info, degree, int(n_strips),
                )

        analysis_data = _letkf_fused_analysis(
            self.localization,
            self.chunksize,
            self.max_obs,
            self.selection,
            self.method,
            degree,
            obs_block,
            taper,
            self.max_obs_strict,
            ens_obs_perts,
            innovations,
            grid_info,
            obs_info,
            jnp.asarray(self.inf_factor, dtype=ens_obs_perts.dtype),
            state.data,
        )
        return state.replace(data=analysis_data)
