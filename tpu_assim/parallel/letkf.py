"""
Grid-sharded LETKF analysis.

The DA analog of data parallelism (SURVEY §2.10): the LETKF analysis is
embarrassingly parallel over grid columns — the reference distributes it with
dask chunking + a per-gridpoint Python loop
(/root/reference/pytassim/interface/letkf.py:121-143); here each device of a
``Mesh`` runs the batched dense solve on its grid shard under ``shard_map``.
Observations are replicated to every shard (identical to the reference's
whole-chunked obs, letkf.py:122-123); the per-shard solve needs no
collectives at all.

``sharded_letkf_analysis`` fuses taper + solve + weight application into one
SPMD program: the state's grid dim is sharded, each shard computes its own
columns' weight matrices and applies them locally.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_assim.interface.mixin_local import map_grid_chunked
from tpu_assim.ops.etkf import letkf_weights_dense

__all__ = ["sharded_letkf_weights", "sharded_letkf_analysis"]

GRID_AXIS = "grid"


def _local_solve(localization, chunksize, perts, innov, grid_info, obs_info,
                 inf_factor):
    """Per-shard localized solve (same math as interface/letkf.py
    ``_letkf_solve``)."""

    def chunk_fn(grid_chunk):
        if localization is None:
            w_loc = jnp.ones(
                (grid_chunk.shape[0], obs_info.shape[0]), dtype=perts.dtype
            )
        else:
            w_loc = localization.taper_weights(grid_chunk, obs_info).astype(
                perts.dtype
            )
        return letkf_weights_dense(perts, innov, w_loc, inf_factor)

    return map_grid_chunked(chunk_fn, grid_info, chunksize)


def sharded_letkf_weights(
    mesh: Mesh,
    localization,
    ens_obs_perts: jnp.ndarray,
    innovations: jnp.ndarray,
    grid_info: jnp.ndarray,
    obs_info: jnp.ndarray,
    inf_factor,
    chunksize: Optional[int] = None,
    axis_name: str = GRID_AXIS,
) -> jnp.ndarray:
    """Per-gridpoint ensemble weights with the grid dim sharded over
    ``mesh``. Returns [grid, k, k] sharded on the grid axis.

    The grid size must divide evenly over the mesh axis (pad upstream if
    needed)."""
    solve = partial(_local_solve, localization, chunksize)
    sharded = jax.shard_map(
        lambda p, i, g, o, rho: solve(p, i, g, o, rho),
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), P()),
        out_specs=P(axis_name),
    )
    return sharded(ens_obs_perts, innovations, grid_info, obs_info,
                   jnp.asarray(inf_factor, dtype=ens_obs_perts.dtype))


def sharded_letkf_analysis(
    mesh: Mesh,
    localization,
    state_data: jnp.ndarray,
    ens_obs_perts: jnp.ndarray,
    innovations: jnp.ndarray,
    grid_info: jnp.ndarray,
    obs_info: jnp.ndarray,
    inf_factor,
    chunksize: Optional[int] = None,
    axis_name: str = GRID_AXIS,
) -> jnp.ndarray:
    """Full sharded analysis: weights + application, one SPMD program.

    Parameters
    ----------
    state_data : [var, time, ens, grid] background ensemble (grid sharded).
    ens_obs_perts : [ens, obs_id] normalized obs-space perturbations
        (replicated).
    innovations : [obs_id] normalized innovations (replicated).
    grid_info / obs_info : coordinate arrays for the taper.

    Returns the analysis ensemble [var, time, ens, grid], grid-sharded.
    """
    solve = partial(_local_solve, localization, chunksize)

    def local_analysis(data, perts, innov, ginfo, oinfo, rho):
        weights = solve(perts, innov, ginfo, oinfo, rho)
        mean = jnp.mean(data, axis=2, keepdims=True)
        state_perts = data - mean
        analysis_perts = jnp.einsum("vtkg,gkm->vtmg", state_perts, weights,
                                      precision=jax.lax.Precision.HIGHEST)
        return mean + analysis_perts

    sharded = jax.shard_map(
        local_analysis,
        mesh=mesh,
        in_specs=(
            P(None, None, None, axis_name),
            P(),
            P(),
            P(axis_name),
            P(),
            P(),
        ),
        out_specs=P(None, None, None, axis_name),
    )
    return sharded(
        state_data, ens_obs_perts, innovations, grid_info, obs_info,
        jnp.asarray(inf_factor, dtype=ens_obs_perts.dtype),
    )
