"""
Localized kernelized ETKF (LKETKF).

TPU-native rebuild of /root/reference/pytassim/interface/lketkf.py:34-116:
the per-gridpoint kernelized solve. The reference reuses the LETKF
per-gridpoint Python loop with the bridged KETKF module and sqrt-weight
scaling of the localized inputs (wrapper.py:86-99); here each grid chunk
scales the shared obs-space inputs by ``sqrt(w)`` per column and evaluates
the kernelized solve batched over columns.

Exactness note: for every built-in kernel except :class:`ModuleKernel`, the
kernel value depends on its inputs only through dot products or pairwise
distances, so zero-scaled (masked-out) observation components contribute
exactly nothing — the fixed-size formulation equals the reference's ragged
subsets. A :class:`ModuleKernel` with a nonlinear feature map sees the padded
zeros; use a mask-aware feature map there.
"""

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from tpu_assim.interface.ketkf import KETKF
from tpu_assim.interface.mixin_local import DomainLocalizedMixin, map_grid_chunked
from tpu_assim.observation import Observation
from tpu_assim.ops.ketkf import ketkf_weights
from tpu_assim.state import EnsembleState

__all__ = ["LKETKF"]


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _lketkf_solve(
    localization, chunksize, method, newton_iters, max_obs, selection,
    strict, kernel, ens_obs_perts, innovations, grid_info, obs_info,
    inf_factor,
):
    from tpu_assim.ops.localization import (
        neighborhood_select,
        neighborhood_select_window,
        safe_sqrt,
    )

    def chunk_fn(grid_chunk):
        if localization is not None and max_obs is not None:
            # Fast localized path (VERDICT r2 #4): fixed-size obs
            # neighborhoods — O(g * k * nb) instead of the dense
            # O(g * k * o) scaled-perts tensor. Exact under the same
            # condition as LETKF (no column with more nonzero-taper obs
            # than max_obs) AND for every kernel whose value depends on
            # its inputs only through dot products / pairwise distances:
            # selecting the nonzero-scaled components equals keeping the
            # zero-scaled ones (module docstring; reference ragged
            # contract: wrapper.py:86-99).
            if selection == "window":
                idx, w_nbh = neighborhood_select_window(
                    localization, grid_chunk, obs_info, max_obs,
                    strict=strict,
                )
            else:
                idx, w_nbh = neighborhood_select(
                    localization, grid_chunk, obs_info, max_obs
                )
            sqrt_w = safe_sqrt(w_nbh).astype(ens_obs_perts.dtype)  # [c, nb]
            scaled_perts = (
                ens_obs_perts[:, idx].transpose(1, 0, 2)
                * sqrt_w[:, None, :]
            )                                                # [c, k, nb]
            scaled_obs = (innovations[idx] * sqrt_w)[:, None, :]
            return ketkf_weights(
                scaled_perts, scaled_obs, kernel, inf_factor,
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
        sqrt_w = safe_sqrt(w_loc)  # [c, l]; zero-weight-gradient safe
        scaled_perts = ens_obs_perts[None, :, :] * sqrt_w[:, None, :]
        scaled_obs = (innovations[None, :] * sqrt_w)[:, None, :]
        return ketkf_weights(scaled_perts, scaled_obs, kernel, inf_factor,
                             method=method, newton_iters=newton_iters)

    return map_grid_chunked(chunk_fn, grid_info, chunksize)


class LKETKF(DomainLocalizedMixin, KETKF):
    """Localized kernelized ETKF (reference: interface/lketkf.py:34).

    ``max_obs`` switches the localized solve to fixed-size obs
    neighborhoods (``selection`` = ``"topk"`` or ``"window"``, same
    semantics as :class:`~tpu_assim.interface.LETKF`): O(g * k * nb)
    instead of the dense O(g * k * o) scaled tensor — both faster and the
    memory fix for large grids. Exact whenever no column has more
    nonzero-taper obs than ``max_obs`` and the kernel is dot-product /
    distance based (module docstring); ``max_obs_strict`` NaN-poisons
    window-selection violations."""

    def __init__(
        self,
        localization=None,
        kernel=None,
        inf_factor: float = 1.0,
        smoother: bool = False,
        pre_transform=None,
        post_transform=None,
        chunksize: Optional[int] = 4096,
        weight_save_path: Optional[str] = None,
        forward_model=None,
        method: str = "eigh",
        newton_iters: int = 25,
        max_obs: Optional[int] = None,
        selection: str = "topk",
        max_obs_strict: bool = True,
    ):
        super().__init__(
            kernel=kernel,
            inf_factor=inf_factor,
            smoother=smoother,
            pre_transform=pre_transform,
            post_transform=post_transform,
            weight_save_path=weight_save_path,
            forward_model=forward_model,
            method=method,
            newton_iters=newton_iters,
        )
        self.localization = localization
        self.chunksize = chunksize
        self.max_obs = max_obs
        self.selection = selection
        self.max_obs_strict = max_obs_strict

    def __str__(self):
        return "Localized KETKF(inf_factor={0}, loc={1}, kernel={2})".format(
            self.inf_factor, str(self.localization), str(self.kernel)
        )

    def __repr__(self):
        return "LKETKF({0},{1},{2})".format(
            repr(self.inf_factor), repr(self.localization), repr(self.kernel)
        )

    def estimate_weights(
        self,
        state: EnsembleState,
        filtered_obs: List[Observation],
        ens_obs: List[jnp.ndarray],
    ) -> jnp.ndarray:
        innovations, ens_obs_perts, obs_info = self._get_obs_space_variables(
            ens_obs, filtered_obs
        )
        grid_info = state.grid_info()
        return _lketkf_solve(
            self.localization,
            self.chunksize,
            self.method,
            self.newton_iters,
            self.max_obs,
            self.selection,
            self.max_obs_strict,
            self.kernel,
            ens_obs_perts,
            innovations,
            grid_info,
            obs_info,
            jnp.asarray(self.inf_factor, dtype=ens_obs_perts.dtype),
        )
