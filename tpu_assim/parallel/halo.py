"""
Obs-sharded LETKF with ICI halo exchange.

The reference replicates the full observation arrays to every dask chunk
(/root/reference/pytassim/interface/letkf.py:122-123 chunks obs as single
whole chunks) — O(n_obs) memory and broadcast traffic per worker. On a TPU
mesh we can do strictly better: domain localization bounds the obs support of
every analysis column to ``2 x`` the Gaspari-Cohn radius (the taper is
exactly zero beyond, ops/localization.py), so a grid shard only ever needs
observations from its own region plus a bounded *halo* of neighboring shards.

Design (the ring-attention-shaped component of SURVEY §5.7/§7.4):

1. **Host-side bucketing** (:func:`shard_observations`): observations are
   assigned to the shard that owns their grid region and padded to a common
   per-shard count — static shapes, validity carried by a mask row.
2. **Local obs-space computation**: each shard gathers its *local* ensemble
   obs equivalents from its own grid block (observations are co-located with
   the columns they observe), so normalization never touches remote state.
3. **Halo exchange**: each shard ppermutes its packed obs block
   ``[k perts | innovation | validity | coords]`` to its ``halo_width``
   neighbors on each side — pure neighbor traffic on the ICI ring, no
   all-gather, no host.
4. **Local solve**: taper + fixed-size neighborhood selection + batched
   weight solve + weight application, all shard-local.

Exactness: a halo of width ``h`` is exact iff every observation with nonzero
taper weight for a local column lies within ``h`` shards — i.e.
``h >= ceil(cutoff / shard_span)`` (:func:`halo_width_for`). Ring wraparound
is harmless for non-periodic domains: wrapped candidates sit far away, get
taper weight exactly 0, and are never selected.
"""

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpu_assim.ops.etkf import letkf_weights_nbh

__all__ = [
    "shard_observations",
    "shard_observations_2d",
    "halo_width_for",
    "halo_letkf_analysis",
    "halo_letkf_analysis_2d",
]


def _plain_abs_dist_probe(localization, n_dim: int) -> bool:
    """Best-effort behavioral probe: does ``localization.dist_func`` act as
    plain per-dimension ``|obs - grid|`` coordinate distance (the distance
    the window kernels implement) on representative offsets?

    Used only to decide whether the ``local_method='window'`` builders warn
    about an ignored custom distance: ``dist_func`` is a *required*
    constructor argument of the Gaspari-Cohn classes and callers follow the
    ``[value, coord...]``-row convention with ad-hoc lambdas, so an
    identity check against :func:`~tpu_assim.ops.localization.abs_distance`
    would warn on every intended build (round-4 advisor finding). The probe
    offsets span well beyond the taper support so periodic wrap distances
    (e.g. :func:`periodic_distance` on typical domains) are detected. A
    dist_func that raises on the probe, returns an unexpected layout, or
    mismatches anywhere => ``False`` (=> warn).
    """
    df = getattr(localization, "dist_func", None)
    if df is None:
        return True
    r = np.atleast_1d(np.asarray(localization.radius, dtype=float))
    r = np.concatenate([r, np.repeat(r[-1], max(0, n_dim - r.size))])
    r = np.maximum(r[:n_dim], 1e-6)
    offs = np.array([0.0, 0.37, -1.13, 2.41, -8.5, 17.5])
    gc = np.zeros(1 + n_dim)
    gc[1:] = 5.0 * r                         # arbitrary interior base point
    n_probe = offs.size * n_dim
    oi = np.tile(gc, (n_probe, 1))
    expect = np.zeros(n_probe)
    for d in range(n_dim):
        for j, o in enumerate(offs):
            row = d * offs.size + j
            oi[row, 1 + d] = gc[1 + d] + o * r[d]
            expect[row] = abs(o) * r[d]
    try:
        got = np.asarray(
            jnp.atleast_2d(df(jnp.asarray(gc), jnp.asarray(oi)))
        )
    except Exception:
        return False
    if got.ndim != 2 or got.shape[-1] != n_probe:
        return False
    # a plain per-dim distance: each probe varies exactly one coordinate,
    # so every returned row is either the expected |delta| or zero — and
    # the expected value appears in some row
    tol = 1e-5 * max(float(r.max()), 1.0)
    near_exp = np.abs(got - expect[None, :]) <= tol * (1.0 + expect)
    near_zero = np.abs(got) <= tol
    covered = near_exp.any(axis=0) | (expect <= tol)
    return bool(((near_exp | near_zero).all()) and covered.all())


def halo_width_for(radius: float, shard_span: float) -> int:
    """Number of neighbor shards (per side) that can hold nonzero-taper
    observations: the Gaspari-Cohn support is ``2 * radius``
    (ops/localization.py; reference polynomials cut at z=2,
    pytassim/localization/gaspari_cohn.py:86-95), a shard spans
    ``shard_span`` in distance units."""
    return max(1, int(math.ceil(2.0 * radius / shard_span)))


def shard_observations(
    obs_vals: np.ndarray,
    obs_var: np.ndarray,
    obs_idx: np.ndarray,
    obs_coords: np.ndarray,
    n_grid: int,
    n_shards: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Bucket observations by owning grid shard and pad to a static
    per-shard count.

    Observations are owned by the shard whose grid block contains their
    observed column (``obs_idx // shard_size``). Padded slots carry
    ``valid = 0`` and point at local column 0.

    Parameters
    ----------
    obs_vals : [o] values.
    obs_var : [o] diagonal variances, or [o, o] correlated covariance. A
        correlated R must be block-diagonal over the shard ownership (no
        nonzero correlation between obs owned by different shards) — the
        same restriction domain decomposition puts on the reference's
        per-chunk whitening (pytassim/observation.py:247-271 whitens the
        full vector; a cross-shard correlation cannot be whitened locally).
    obs_idx : [o] int observed grid columns.
    obs_coords : [o, d] obs coordinates.
    n_grid : total grid size (must divide evenly by ``n_shards``).
    n_shards : number of grid shards.

    Returns
    -------
    (vals [s*p], var, local_idx [s*p], coords [s*p, d], valid [s*p],
     obs_per_shard p) — flat arrays whose leading dim shards evenly over the
    mesh grid axis. ``var`` is [s*p] for diagonal input or [s*p, p]
    per-shard covariance blocks for correlated input (padded slots carry
    unit diagonal).
    """
    if n_grid % n_shards:
        raise ValueError("n_grid must divide evenly over n_shards")
    shard_size = n_grid // n_shards
    obs_var = np.asarray(obs_var)
    correlated = obs_var.ndim == 2
    owner = np.asarray(obs_idx) // shard_size
    counts = np.bincount(owner, minlength=n_shards)
    obs_per_shard = int(counts.max())
    d = obs_coords.shape[1]
    vals = np.zeros((n_shards, obs_per_shard), dtype=obs_vals.dtype)
    if correlated:
        var = np.tile(
            np.eye(obs_per_shard, dtype=obs_var.dtype), (n_shards, 1, 1)
        )
    else:
        var = np.ones((n_shards, obs_per_shard), dtype=obs_var.dtype)
    lidx = np.zeros((n_shards, obs_per_shard), dtype=np.int32)
    coords = np.zeros((n_shards, obs_per_shard, d), dtype=obs_coords.dtype)
    valid = np.zeros((n_shards, obs_per_shard), dtype=obs_vals.dtype)
    fill = np.zeros(n_shards, dtype=np.int64)
    slot = np.zeros(len(obs_vals), dtype=np.int64)
    for o in range(len(obs_vals)):
        s = owner[o]
        j = fill[s]
        vals[s, j] = obs_vals[o]
        if not correlated:
            var[s, j] = obs_var[o]
        lidx[s, j] = obs_idx[o] - s * shard_size
        coords[s, j] = obs_coords[o]
        valid[s, j] = 1.0
        slot[o] = j
        fill[s] += 1
    if correlated:
        nz_i, nz_j = np.nonzero(obs_var)
        if np.any(owner[nz_i] != owner[nz_j]):
            raise ValueError(
                "correlated R must be block-diagonal over the shard "
                "ownership: found nonzero correlation between obs owned by "
                "different shards"
            )
        var[owner[nz_i], slot[nz_i], slot[nz_j]] = obs_var[nz_i, nz_j]
    return (
        vals.reshape(-1),
        var.reshape(-1, obs_per_shard) if correlated else var.reshape(-1),
        lidx.reshape(-1),
        coords.reshape(-1, d),
        valid.reshape(-1),
        obs_per_shard,
    )


def _halo_offsets(n_shards: int, halo_width: int):
    """Distinct nonzero ring offsets within the halo. On small rings the
    +h and -h hops can alias (e.g. n=2: +1 == -1); including an aliased
    block twice would double-count its observations in the weighted Gram,
    so each distinct source shard appears exactly once."""
    seen, offsets = {0}, []
    for h in range(1, halo_width + 1):
        for off in (h % n_shards, (-h) % n_shards):
            if off not in seen:
                seen.add(off)
                offsets.append(off)
    return offsets


def _ring_halo(packed: jnp.ndarray, axis_name: str, n_shards: int,
               halo_width: int) -> jnp.ndarray:
    """Concatenate a shard's packed obs block with its halo neighbors'
    blocks via ring ppermutes (neighbor-hop traffic on ICI). packed is
    [rows, o_ps]; returns [rows, n_blocks * o_ps]."""
    blocks = [packed]
    for off in _halo_offsets(n_shards, halo_width):
        blocks.append(jax.lax.ppermute(
            packed, axis_name,
            perm=[(i, (i + off) % n_shards) for i in range(n_shards)],
        ))
    return jnp.concatenate(blocks, axis=-1)


def _ring_halo_sorted(packed: jnp.ndarray, coord_row: int, axis_name: str,
                      n_shards: int, halo_width: int) -> jnp.ndarray:
    """Halo concat in ASCENDING ring-offset order ``[-h .. -1, 0, 1 .. h]``
    for the windowed local solve (:func:`halo_letkf_analysis` with
    ``local_method="window"``), which needs the candidate coordinate row
    (``packed[coord_row]``) sorted ascending across the whole concat.

    Wrapped blocks — source shard ``s + off`` outside ``[0, n)`` — have
    their coordinate row pushed to ``-/+ float32.max``: on a non-periodic
    domain their taper weight is zero anyway, and the sentinel coordinates
    keep the concat sorted AND rank-inert in the window kernel (below /
    above every support bound). Unlike :func:`_halo_offsets`, aliased
    ``+/-off`` hops on small rings are included on BOTH sides, each masked
    by its own wrap condition — on a non-periodic domain at most one side
    is unwrapped per shard, so every real observation is visible exactly
    once.
    """
    s = jax.lax.axis_index(axis_name)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, packed.dtype)
    blocks = []
    for off in range(-halo_width, halo_width + 1):
        if off == 0:
            blocks.append(packed)
            continue
        if abs(off) >= n_shards:
            # wrapped for EVERY shard (s + off outside [0, n) for all s):
            # the block would be pure sentinel everywhere — drop it
            # statically. On a 1-device ring this removes the whole
            # exchange (bench config 3 runs the halo program single-chip).
            continue
        # receiver s gets the block of shard (s + off)
        blk = jax.lax.ppermute(
            packed, axis_name,
            perm=[(i, (i - off) % n_shards) for i in range(n_shards)],
        )
        if off > 0:
            wrapped = s + off >= n_shards
            fill = big
        else:
            wrapped = s + off < 0
            fill = -big
        coords = jnp.where(wrapped, fill, blk[coord_row])
        blk = jnp.concatenate([blk[:coord_row], coords[None, :]], axis=0)
        blocks.append(blk)
    return jnp.concatenate(blocks, axis=-1)


def _ring_halo_rdma(packed: jnp.ndarray, axis_name: str, n_shards: int,
                    halo_width: int,
                    interpret: bool | None = None) -> jnp.ndarray:
    """The halo exchange as ONE Pallas kernel using inter-chip RDMA
    (``pltpu.make_async_remote_copy``) instead of XLA ppermutes.

    All halo hops are issued as concurrent remote DMAs after a rendezvous
    barrier with the halo partners, so the transfers overlap each other on
    the ICI links (XLA serializes the ppermutes of :func:`_ring_halo` into
    distinct collective steps). Produces bit-identical block layout to
    ``_ring_halo``: slot ``j+1`` holds the block of shard ``(me - off_j)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets = _halo_offsets(n_shards, halo_width)
    n_blk = len(offsets)
    if n_blk == 0:
        return packed
    rows, o_ps = packed.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Mosaic requires the remote-DMA destination slice (out_ref.at[i],
    # [rows, o_ps]) tile-aligned: pad to (8, 128) multiples and slice the
    # padding back off after the exchange (caught by the compiled smoke
    # tests_tpu/test_compiled_parity.py::TestRdmaCompiledSmoke — interpret
    # mode accepts any shape).
    rows_p = -(-rows // 8) * 8
    o_p = -(-o_ps // 128) * 128
    if (rows_p, o_p) != (rows, o_ps):
        packed = jnp.pad(packed, ((0, rows_p - rows), (0, o_p - o_ps)))

    def kern(in_ref, out_ref, send_sem, recv_sem):
        my = jax.lax.axis_index(axis_name)
        n = jnp.int32(n_shards)
        # rendezvous: every halo partner must have entered the kernel (its
        # receive buffer exists) before anyone writes remotely. The offset
        # set is symmetric as a set (h and -h mod n), so signaling each
        # destination also covers each source. (The interpreter emulates
        # devices synchronously and cannot lower the barrier semaphore, so
        # the rendezvous is compiled-mode only.)
        if not interpret:
            barrier = pltpu.get_barrier_semaphore()
            for off in offsets:
                pltpu.semaphore_signal(
                    barrier, inc=1,
                    device_id=jax.lax.rem(my + jnp.int32(off), n),
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
            pltpu.semaphore_wait(barrier, n_blk)
        out_ref[0] = in_ref[:]
        copies = []
        for i, off in enumerate(offsets):
            rdma = pltpu.make_async_remote_copy(
                src_ref=in_ref,
                dst_ref=out_ref.at[1 + i],
                send_sem=send_sem.at[i],
                recv_sem=recv_sem.at[i],
                device_id=jax.lax.rem(my + jnp.int32(off), n),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            copies.append(rdma)
        for rdma in copies:
            rdma.wait()

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1 + n_blk, rows_p, o_p),
                                       packed.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_blk,)),
                        pltpu.SemaphoreType.DMA((n_blk,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0,
        ),
        interpret=interpret,
    )(packed)
    out = out[:, :rows, :o_ps]
    return out.transpose(1, 0, 2).reshape(rows, (1 + n_blk) * o_ps)


def _halo_auto_degree(state_data, obs_vals, obs_var, obs_lidx, obs_coords,
                      obs_valid, n_shards, max_obs, inf_factor,
                      consecutive: bool) -> int:
    """Measured Chebyshev degree for the halo entry points (host-side
    numpy, concrete inputs) — the multi-chip port of
    ``LETKF._auto_cheb_degree`` (interface/letkf.py): the solve operator
    per column is ``X = I + Zh Zh^T / reg`` with spectrum bounded by
    ``1 + tr(S)/reg``, ``tr(S) = sum_o w_o ||z_o||^2 <= `` the largest
    ``max_obs``-subset sum of whitened perturbation norms. ``consecutive``
    uses the tighter max-consecutive-window bound (sorted-coordinate
    window selection); otherwise the top-``max_obs`` global sum (valid for
    any taper/top-k selection since ``w <= 1``)."""
    import numpy as np

    from tpu_assim.ops.pallas.letkf import cheb_degree_for

    state = np.asarray(state_data, dtype=np.float64)
    k, g = state.shape
    p = np.asarray(obs_vals).shape[0] // n_shards
    shard_size = g // n_shards
    lidx = np.asarray(obs_lidx)
    gidx = (np.arange(n_shards * p) // p) * shard_size + lidx
    valid = np.asarray(obs_valid) > 0
    ens_obs = state[:, gidx]
    mean = ens_obs.mean(axis=0, keepdims=True)
    perts = ens_obs - mean
    var = np.asarray(obs_var, dtype=np.float64)
    if var.ndim == 2:
        # per-shard correlated blocks: whiten by the local Cholesky factor
        blocks = var.reshape(n_shards, p, p)
        pb = perts.reshape(k, n_shards, p)
        for s in range(n_shards):
            chol = np.linalg.cholesky(blocks[s])
            pb[:, s, :] = np.linalg.solve(chol, pb[:, s, :].T).T
        perts = pb.reshape(k, n_shards * p)
    else:
        perts = perts / np.sqrt(var)[None, :]
    znorm = np.sum(perts**2, axis=0) * valid
    reg = (k - 1) / float(inf_factor)
    width = min(int(max_obs), int(valid.sum())) or 1
    if consecutive:
        ox = np.asarray(obs_coords)[:, 0]
        order = np.argsort(ox[valid], kind="stable")
        zs = znorm[valid][order]
        cs = np.concatenate([[0.0], np.cumsum(zs)])
        tr_max = float((cs[width:] - cs[:-width]).max()) if len(zs) else 0.0
    else:
        tr_max = float(np.sort(znorm)[-width:].sum())
    return cheb_degree_for(1.0 + tr_max / reg)


def _halo_max_in_support(obs_coords, obs_valid, n_shards, radius, taper,
                         epsilon, halo_width) -> int:
    """Worst per-column candidate count inside the taper support for the
    windowed halo path (host-side numpy, exact, incl. PAD slots): padded
    bucket slots are pinned to the shard's max valid obs coordinate (left
    grid edge fallback is <= that of the ring predecessor) and, though
    zero-valued, consume window slots whenever their pinned coordinate
    falls inside a column's support — the kernel's overflow guard counts
    them, so the precheck must too. Grid columns are not needed: the
    worst count over columns equals the largest candidate cluster inside
    any open support window, evaluated at candidate positions."""
    import numpy as np

    from tpu_assim.ops.localization import taper_support_z

    coords = np.asarray(obs_coords)[:, 0]
    valid = np.asarray(obs_valid) > 0
    p = coords.shape[0] // n_shards
    cand = []
    for s in range(n_shards):
        sl = slice(s * p, (s + 1) * p)
        c = coords[sl][valid[sl]]
        cand.append(c)
        n_pad = p - c.shape[0]
        if n_pad and c.shape[0]:
            cand.append(np.full(n_pad, c.max()))
        # obs-free shards pin pads to the shard's left grid edge, which
        # cannot exceed any real obs coordinate of later shards — their
        # exact position is unknown here, so count them at every shard
        # boundary position is overly pessimistic; instead they are
        # counted at the previous shard's max (the sorted-concat slot
        # they occupy is equivalent for window counting).
        elif n_pad and cand:
            prev = cand[-1] if len(cand[-1]) else None
            if prev is not None and len(prev):
                cand.append(np.full(n_pad, prev.max()))
    if not cand:
        return 0
    allc = np.sort(np.concatenate(cand))
    s_cut = taper_support_z(taper, epsilon) * radius
    # worst over columns = max candidates in any open interval of width
    # 2*s_cut; scanning interval ends at candidate positions is exact
    lo = np.searchsorted(allc, allc - 2 * s_cut, side="right")
    hi = np.arange(1, allc.shape[0] + 1)
    return int((hi - lo).max()) if allc.size else 0


def halo_letkf_analysis(
    mesh: Mesh,
    localization,
    max_obs: int,
    halo_width: int = 1,
    inf_factor: float = 1.0,
    method: str = "eigh",
    newton_iters: int = 25,
    axis_name: str = "grid",
    use_pallas: bool = False,
    cheb_degree: int | None = None,
    comm: str = "ppermute",
    local_method: str = "topk",
    max_obs_strict: bool = True,
) -> Callable:
    """Build a jitted obs-sharded LETKF analysis over ``mesh``.

    ``comm``: ``"ppermute"`` — XLA ring collectives (default);
    ``"rdma"`` — the halo exchange as one Pallas kernel of concurrent
    inter-chip remote DMAs (:func:`_ring_halo_rdma`), bit-identical blocks.

    ``cheb_degree``: Chebyshev degree for the fused local solves
    (``use_pallas`` / ``local_method="window"``). ``None`` (default) =
    auto: each concrete call measures the spectral bound of the obs-space
    operator host-side and picks the smallest sufficient degree
    (:func:`_halo_auto_degree` — the multi-chip port of the class API's
    auto degree); calls under an outer jit must pin an int validated
    against a concrete auto call. ``max_obs_strict`` (default True) makes
    concrete windowed calls raise when any column's in-support candidate
    count (valid obs + pad slots) exceeds ``max_obs``.

    ``local_method``: ``"topk"`` (default) — dense taper over all halo
    candidates + ``top_k`` neighborhood selection per column (any
    localization / distance function). ``"window"`` — each shard runs the
    monolithic sorted-window kernel
    (:func:`tpu_assim.ops.pallas.letkf.letkf_window_analysis_fused`) on its
    halo candidates: no dense [g_loc, o_cand] taper, no top_k, no gather —
    the fast path for 1-D NON-PERIODIC Gaspari-Cohn localization with
    coordinate-sorted obs. NOTE the window path replaces the
    localization's ``dist_fn`` with plain ``|obs_x - grid_x|`` coordinate
    distance and masks ring-wrapped candidates out — a periodic or custom
    distance that works under ``"topk"`` gives different (finite) results
    here, so a warning is emitted when ``localization.dist_fn`` is set.
    Requirements are checked at build time where possible; sortedness
    violations NaN-poison loudly inside the kernel. Pad slots are pinned
    to the shard's max valid obs coordinate (the shard's LEFT grid edge
    when it owns no obs; values are already zeroed, so a selected pad
    contributes nothing but does consume window slots — size ``max_obs``
    with headroom when shard obs counts are unbalanced; the kernel's
    strict guard stays loud).

    Returns
    -------
    analysis_fn(state_data [k, g], obs_vals [s*p], obs_var [s*p],
                obs_local_idx [s*p], obs_coords [s*p, d], obs_valid [s*p],
                grid_coords [g, d]) -> analysis [k, g]

    with the obs arrays produced by :func:`shard_observations` (leading dim
    sharded over the grid mesh axis alongside the state's grid dim).

    Each shard computes its local obs-space perturbations/innovations from
    its own state block, halo-exchanges them, tapers + neighborhood-selects
    its ``max_obs`` strongest candidates per column, and solves/applies
    locally. With ``halo_width >= halo_width_for(radius, shard_span)`` the
    result is exactly the replicated-obs analysis.
    """
    # The ring permutation runs over ``axis_name`` only — the shard count is
    # that axis's extent, NOT the total device count (a 2-D mesh passed to
    # this 1-D entry used to produce perm indices past the axis size).
    if axis_name not in mesh.shape:
        raise ValueError(
            f"axis_name {axis_name!r} not in mesh axes {mesh.axis_names}"
        )
    n_shards = int(mesh.shape[axis_name])

    if local_method not in ("topk", "window"):
        raise ValueError(
            f"local_method must be 'topk' or 'window', got {local_method!r}"
        )
    if local_method == "window":
        import numpy as np

        from tpu_assim.ops.localization import GaspariCohnInf

        if not hasattr(localization, "radius"):
            raise TypeError(
                "local_method='window' needs a Gaspari-Cohn localization "
                "(single radius); got {0}".format(type(localization))
            )
        radius_arr = np.atleast_1d(np.asarray(localization.radius))
        if radius_arr.size != 1:
            raise ValueError(
                "local_method='window' supports a single localization "
                "radius; got {0}".format(radius_arr)
            )
        _win_radius = float(radius_arr[0])
        _win_taper = (
            "gcinf" if isinstance(localization, GaspariCohnInf) else "gc2"
        )
        _win_eps = float(localization.epsilon)
        # dist_func is a required constructor argument, so warn only when
        # it does NOT behave as the plain coordinate distance the window
        # kernel implements — otherwise the warning is pure noise on every
        # intended build (round-4 advisor finding).
        if not _plain_abs_dist_probe(localization, 1):
            import logging

            logging.getLogger(__name__).warning(
                "local_method='window' ignores the localization's dist_fn: "
                "the window kernel uses plain |obs_x - grid_x| coordinate "
                "distance and masks ring-wrapped candidates (non-periodic "
                "domains only). Use local_method='topk' for periodic or "
                "custom distances."
            )

    def local_fn(state_loc, vals, var, lidx, ocoords, valid, gcoords, rho,
                 *, degree):
        k = state_loc.shape[0]
        # local obs equivalents from the local grid block
        ens_obs = jnp.take(state_loc, lidx, axis=-1)          # [k, o_ps]
        mean = jnp.mean(ens_obs, axis=0, keepdims=True)
        if var.ndim == 2:
            # per-shard correlated R block (shard_observations): whiten by
            # the local Cholesky factor — padded slots carry unit diagonal
            # and stay isolated, then are zeroed by the validity mask
            from jax.scipy.linalg import solve_triangular

            chol = jnp.linalg.cholesky(var)
            perts = solve_triangular(
                chol, (ens_obs - mean).T, lower=True
            ).T * valid
            innov = solve_triangular(
                chol, vals - mean[0], lower=True
            ) * valid
        else:
            rcinv = 1.0 / jnp.sqrt(var)
            perts = (ens_obs - mean) * rcinv * valid          # [k, o_ps]
            innov = (vals - mean[0]) * rcinv * valid          # [o_ps]
        if local_method == "window":
            # Windowed local solve: pack [perts | innov | x], pin pad-slot
            # coordinates to the shard's max valid obs coordinate (left
            # grid edge when the shard owns no obs; their values are zeroed
            # above, so a selected pad contributes exactly nothing, and the
            # pinning keeps the concat of neighboring blocks sorted),
            # halo-exchange in ascending ring order, and run the monolithic
            # window kernel on the candidates — no dense taper, no top_k,
            # no gather.
            from tpu_assim.ops.pallas.letkf import (
                letkf_window_analysis_fused,
            )

            # Pad coordinate: >= every real obs of this shard and <= every
            # real obs of the next (obs bucketing is monotone in
            # coordinate), so the cross-block concat stays sorted: the max
            # valid obs coordinate, or the shard's left grid edge when the
            # shard owns no obs. Sortedness violations (unsorted input obs)
            # NaN-poison inside the kernel — loud, never silently wrong.
            big = jnp.asarray(jnp.finfo(jnp.float32).max, ocoords.dtype)
            pad_x = jnp.maximum(
                jnp.max(jnp.where(valid > 0, ocoords[:, 0], -big)),
                jnp.min(gcoords[:, 0]).astype(ocoords.dtype),
            )
            obs_x = jnp.where(valid > 0, ocoords[:, 0], pad_x)
            packed_w = jnp.concatenate(
                [perts, innov[None, :], obs_x[None, :]], axis=0
            )
            cand = _ring_halo_sorted(
                packed_w, k + 1, axis_name, n_shards, halo_width
            )
            mean_s = jnp.mean(state_loc, axis=0)
            sp = state_loc - mean_s[None, :]
            reg = jnp.asarray(k - 1, state_loc.dtype) / rho
            out = letkf_window_analysis_fused(
                cand[:k], cand[k], cand[k + 1], gcoords[:, 0], sp, mean_s,
                reg, _win_radius, k, nb=max_obs, degree=degree,
                taper=_win_taper, epsilon=_win_eps,
            )
            return out.astype(state_loc.dtype)

        # pack [perts | innov | valid | coords^T] and halo-exchange
        packed = jnp.concatenate(
            [perts, innov[None, :], valid[None, :], ocoords.T], axis=0
        )
        if comm == "rdma":
            cand = _ring_halo_rdma(packed, axis_name, n_shards, halo_width)
        else:
            cand = _ring_halo(packed, axis_name, n_shards, halo_width)
        c_perts = cand[:k]
        c_innov = cand[k]
        c_valid = cand[k + 1]
        c_coords = cand[k + 2:].T                             # [c, d]
        # taper against local columns; invalid slots get weight 0
        grid_info = jnp.concatenate(
            [jnp.zeros((gcoords.shape[0], 1), gcoords.dtype), gcoords],
            axis=1,
        )
        obs_info = jnp.concatenate(
            [jnp.zeros((c_coords.shape[0], 1), c_coords.dtype), c_coords],
            axis=1,
        )
        w_loc = localization.taper_weights(grid_info, obs_info)
        w_loc = w_loc * c_valid[None, :]

        n_cand = w_loc.shape[-1]
        kk = min(max_obs, n_cand)
        top_w, top_idx = jax.lax.top_k(w_loc, kk)
        if kk < max_obs:
            pad = max_obs - kk
            top_w = jnp.pad(top_w, ((0, 0), (0, pad)))
            top_idx = jnp.pad(top_idx, ((0, 0), (0, pad)))

        mean_s = jnp.mean(state_loc, axis=0)
        sp = state_loc - mean_s[None, :]
        if use_pallas:
            # fused lane-major Chebyshev kernel (the fast single-chip path,
            # ops/pallas/letkf.py:letkf_nbh_analysis_cheb) on each shard
            from tpu_assim.ops.localization import safe_sqrt
            from tpu_assim.ops.pallas.letkf import letkf_nbh_analysis_cheb

            sw = safe_sqrt(top_w).astype(c_perts.dtype)       # [g, nb]
            zh = c_perts[:, top_idx].transpose(2, 0, 1) * sw.T[:, None, :]
            yh = c_innov[top_idx].T * sw.T                    # [nb, g]
            reg = jnp.asarray((k - 1) / inf_factor, c_perts.dtype)
            out = letkf_nbh_analysis_cheb(
                zh, yh, sp, mean_s, reg, k, degree=degree
            )
            return out.astype(state_loc.dtype)
        weights = letkf_weights_nbh(
            c_perts, c_innov, top_idx.astype(jnp.int32),
            top_w.astype(c_perts.dtype), rho,
            method=method, newton_iters=newton_iters,
        )
        return mean_s[None, :] + jnp.einsum(
            "kg,gkm->mg", sp, weights, precision=jax.lax.Precision.HIGHEST
        )

    def _build(degree: int):
        import functools

        lf = functools.partial(local_fn, degree=degree)

        @jax.jit
        def analysis_fn_inner(state_data, obs_vals, obs_var, obs_local_idx,
                              obs_coords, obs_valid, grid_coords):
            # var spec depends on diag ([s*p]) vs correlated blocks
            # ([s*p, p]); the shard_map is built at trace time so the spec
            # can follow the input rank
            var_spec = (P(axis_name, None) if obs_var.ndim == 2
                        else P(axis_name))
            sharded = jax.shard_map(
                lf,
                mesh=mesh,
                in_specs=(
                    P(None, axis_name),   # state [k, g]
                    P(axis_name),         # obs vals
                    var_spec,             # obs var (diag or cov blocks)
                    P(axis_name),         # obs local idx
                    P(axis_name, None),   # obs coords
                    P(axis_name),         # obs valid
                    P(axis_name, None),   # grid coords
                    P(),                  # rho
                ),
                out_specs=P(None, axis_name),
                # pallas_call outputs carry no varying-mesh-axes metadata,
                # so the manual check is disabled only on the Pallas/RDMA
                # branches; the plain-XLA branch keeps it
                check_vma=not (use_pallas or comm == "rdma"
                               or local_method == "window"),
            )
            return sharded(
                state_data, obs_vals, obs_var, obs_local_idx, obs_coords,
                obs_valid, grid_coords,
                jnp.asarray(inf_factor, state_data.dtype),
            )

        return analysis_fn_inner

    _cache: dict = {}
    needs_degree = use_pallas or local_method == "window"

    def analysis_fn(state_data, obs_vals, obs_var, obs_local_idx, obs_coords,
                    obs_valid, grid_coords):
        concrete = not any(
            isinstance(a, jax.core.Tracer)
            for a in (state_data, obs_vals, obs_var, obs_coords, obs_valid)
        )
        if (local_method == "window" and max_obs_strict and concrete):
            # In-support precheck (VERDICT r3 #3): the fixed-size window is
            # exact iff no column sees more in-support candidates (real obs
            # PLUS coordinate-pinned pad slots) than max_obs — degree
            # truncation and slot exhaustion are the two error classes the
            # NaN-poison discipline cannot catch, so concrete callers fail
            # loudly here like the class API does (interface/letkf.py).
            worst = _halo_max_in_support(
                obs_coords, obs_valid, n_shards, _win_radius, _win_taper,
                _win_eps, halo_width,
            )
            if worst > max_obs:
                raise ValueError(
                    f"a grid column may see {worst} in-support candidates "
                    f"(valid obs + pad slots) but max_obs={max_obs}: the "
                    f"window selection would truncate. Raise max_obs to >= "
                    f"{worst} (pad slots count — rebalance shard obs "
                    "counts to shrink them) or pass max_obs_strict=False."
                )
        degree = cheb_degree
        if degree is None and needs_degree:
            if not concrete:
                raise ValueError(
                    "cheb_degree=None (auto) needs concrete inputs to "
                    "measure the spectral bound; pin cheb_degree=<int> "
                    "when calling the halo analysis under an outer jit "
                    "(validate the pin against an auto-measured concrete "
                    "call first)"
                )
            degree = _halo_auto_degree(
                state_data, obs_vals, obs_var, obs_local_idx, obs_coords,
                obs_valid, n_shards, max_obs, inf_factor,
                consecutive=(local_method == "window"),
            )
        elif degree is None:
            degree = 16  # unused by the weight-based local solves
        fn = _cache.get(degree)
        if fn is None:
            fn = _cache[degree] = _build(degree)
        return fn(state_data, obs_vals, obs_var, obs_local_idx, obs_coords,
                  obs_valid, grid_coords)

    return analysis_fn


# ---------------------------------------------------------------------------
# 2-D domain decomposition
# ---------------------------------------------------------------------------

def shard_observations_2d(
    obs_vals: np.ndarray,
    obs_var: np.ndarray,
    obs_ij: np.ndarray,
    obs_coords: np.ndarray,
    grid_shape: Tuple[int, int],
    mesh_shape: Tuple[int, int],
):
    """Bucket observations of a 2-D (rows x cols) grid by owning mesh tile.

    Parameters
    ----------
    obs_vals / obs_var : [o].
    obs_ij : [o, 2] int observed (row, col) grid positions.
    obs_coords : [o, d] obs coordinates for the taper.
    grid_shape : (n_rows, n_cols) of the physical grid.
    mesh_shape : (mesh_rows, mesh_cols) of the device mesh.

    Returns flat per-tile arrays shaped ``[tiles * p, ...]`` (tile-major,
    row-major tile order — matching a grid array sharded over
    ``P('row', 'col')``) plus the local flat index inside each tile block and
    the per-tile pad count ``p``.
    """
    n_rows, n_cols = grid_shape
    m_rows, m_cols = mesh_shape
    if n_rows % m_rows or n_cols % m_cols:
        raise ValueError("grid_shape must divide evenly over mesh_shape")
    tr, tc = n_rows // m_rows, n_cols // m_cols
    owner = (obs_ij[:, 0] // tr) * m_cols + (obs_ij[:, 1] // tc)
    n_tiles = m_rows * m_cols
    counts = np.bincount(owner, minlength=n_tiles)
    p = max(int(counts.max()), 1)
    d = obs_coords.shape[1]
    obs_var = np.asarray(obs_var)
    correlated = obs_var.ndim == 2
    vals = np.zeros((n_tiles, p), dtype=obs_vals.dtype)
    if correlated:
        var = np.tile(np.eye(p, dtype=obs_var.dtype), (n_tiles, 1, 1))
    else:
        var = np.ones((n_tiles, p), dtype=obs_var.dtype)
    lidx = np.zeros((n_tiles, p), dtype=np.int32)
    coords = np.zeros((n_tiles, p, d), dtype=obs_coords.dtype)
    valid = np.zeros((n_tiles, p), dtype=obs_vals.dtype)
    fill = np.zeros(n_tiles, dtype=np.int64)
    slot = np.zeros(len(obs_vals), dtype=np.int64)
    for o in range(len(obs_vals)):
        t = owner[o]
        j = fill[t]
        vals[t, j] = obs_vals[o]
        if not correlated:
            var[t, j] = obs_var[o]
        li = (obs_ij[o, 0] % tr) * tc + (obs_ij[o, 1] % tc)
        lidx[t, j] = li
        coords[t, j] = obs_coords[o]
        valid[t, j] = 1.0
        slot[o] = j
        fill[t] += 1
    if correlated:
        nz_i, nz_j = np.nonzero(obs_var)
        if np.any(owner[nz_i] != owner[nz_j]):
            raise ValueError(
                "correlated R must be block-diagonal over the tile "
                "ownership: found nonzero correlation between obs owned by "
                "different tiles"
            )
        var[owner[nz_i], slot[nz_i], slot[nz_j]] = obs_var[nz_i, nz_j]
    return (
        vals.reshape(-1),
        var.reshape(-1, p) if correlated else var.reshape(-1),
        lidx.reshape(-1),
        coords.reshape(-1, d), valid.reshape(-1), p,
    )


def _ring_halo_2d(packed, row_axis, col_axis, mesh_rows, mesh_cols,
                  halo_r, halo_c):
    """2-D halo: exchange a tile's packed obs block with its
    (2*halo_r+1) x (2*halo_c+1) neighborhood of tiles. Row-axis ppermutes
    first, then column-axis ppermutes of the row-concatenated block —
    corners arrive via the two-step relay, all traffic neighbor-hop on the
    ICI torus. packed [rows, p] -> [rows, (2hr+1)*(2hc+1)*p]."""
    row_blocks = [packed]
    for off in _halo_offsets(mesh_rows, halo_r):
        row_blocks.append(jax.lax.ppermute(
            packed, row_axis,
            perm=[(i, (i + off) % mesh_rows) for i in range(mesh_rows)]))
    row_cat = jnp.concatenate(row_blocks, axis=-1)
    col_blocks = [row_cat]
    for off in _halo_offsets(mesh_cols, halo_c):
        col_blocks.append(jax.lax.ppermute(
            row_cat, col_axis,
            perm=[(i, (i + off) % mesh_cols) for i in range(mesh_cols)]))
    return jnp.concatenate(col_blocks, axis=-1)


def _ring_halo_2d_masked(packed, coord_start, row_axis, col_axis,
                         mesh_rows, mesh_cols, halo_r, halo_c):
    """2-D halo exchange for the windowed local solve: every block whose
    source tile wrapped around the torus on either axis gets its coordinate
    rows (``packed[coord_start:]``) pushed to ``+float32.max`` — on a
    non-periodic domain wrapped candidates carry zero taper weight, and the
    sentinel removes them from every y-band of the 2-D window kernel
    (which re-sorts internally, so no ordering contract is needed).
    Aliased ``+/-off`` hops on small rings are included on BOTH sides, each
    masked by its own wrap condition (at most one side is unwrapped per
    tile on a non-periodic domain, so every real obs appears exactly once).
    """
    big = jnp.asarray(jnp.finfo(jnp.float32).max, packed.dtype)

    def exchange(block, axis_name, n, width):
        s = jax.lax.axis_index(axis_name)
        out = []
        for off in range(-width, width + 1):
            if off == 0:
                out.append(block)
                continue
            if abs(off) >= n:
                # wrapped for every tile on this axis — statically drop
                # (see _ring_halo_sorted)
                continue
            blk = jax.lax.ppermute(
                block, axis_name,
                perm=[(i, (i - off) % n) for i in range(n)],
            )
            wrapped = (s + off >= n) if off > 0 else (s + off < 0)
            coords = jnp.where(wrapped, big, blk[coord_start:])
            blk = jnp.concatenate([blk[:coord_start], coords], axis=0)
            out.append(blk)
        return jnp.concatenate(out, axis=-1)

    row_cat = exchange(packed, row_axis, mesh_rows, halo_r)
    return exchange(row_cat, col_axis, mesh_cols, halo_c)


def halo_letkf_analysis_2d(
    mesh: Mesh,
    localization,
    max_obs: int,
    grid_shape: Tuple[int, int],
    halo: Tuple[int, int] = (1, 1),
    inf_factor: float = 1.0,
    method: str = "eigh",
    newton_iters: int = 25,
    row_axis: str = "row",
    col_axis: str = "col",
    use_pallas: bool = False,
    cheb_degree: int | None = None,
    local_method: str = "topk",
    obs_block: int = 0,
    max_obs_strict: bool = True,
) -> Callable:
    """Obs-sharded LETKF over a 2-D (row, col) domain decomposition.

    ``cheb_degree=None`` (default) auto-measures the degree per concrete
    call and ``max_obs_strict=True`` prechecks the per-column in-support
    count on concrete windowed calls — see :func:`halo_letkf_analysis`
    (2-D pad slots carry sentinel coordinates outside every band, so only
    real observations count here).

    Returns
    -------
    analysis_fn(state_data [k, R, C], obs_vals [t*p], obs_var [t*p],
                obs_local_idx [t*p], obs_coords [t*p, d], obs_valid [t*p],
                grid_coords [R, C, d]) -> analysis [k, R, C]

    with obs arrays from :func:`shard_observations_2d`. State rows shard over
    ``row_axis``, columns over ``col_axis``; every tile halo-exchanges its
    packed obs block with its ``(2*halo[0]+1) x (2*halo[1]+1)`` tile
    neighborhood over the ICI torus (two-axis neighbor ppermutes, corners by
    relay). Exact when the taper support fits inside the halo (the 2-D
    :func:`halo_width_for` bound per axis).
    """
    m_rows = mesh.shape[row_axis]
    m_cols = mesh.shape[col_axis]
    halo_r, halo_c = halo

    if local_method not in ("topk", "window"):
        raise ValueError(
            f"local_method must be 'topk' or 'window', got {local_method!r}"
        )
    if local_method == "window":
        import numpy as _np

        from tpu_assim.ops.localization import GaspariCohnInf

        if obs_block <= 0:
            raise ValueError(
                "local_method='window' needs obs_block > 0 — compute it "
                "from the global workload with required_obs_block_2d "
                "(a loose bound is fine; too-small blocks NaN-poison "
                "loudly, never truncate silently)"
            )
        if not hasattr(localization, "radius"):
            raise TypeError(
                "local_method='window' needs a Gaspari-Cohn localization; "
                "got {0}".format(type(localization))
            )
        _radii = _np.atleast_1d(_np.asarray(localization.radius,
                                            dtype=float))
        _win_rx = float(_radii[0])
        _win_ry = float(_radii[1] if _radii.size > 1 else _radii[-1])
        _win_taper = (
            "gcinf" if isinstance(localization, GaspariCohnInf) else "gc2"
        )
        _win_eps = float(localization.epsilon)
        # Same constraint as the 1-D builder: the window path uses plain
        # per-dimension |obs - grid| coordinate distances (non-periodic
        # domains), ignoring any custom dist_fn — warn only when dist_func
        # does not behave as that plain distance (see the 1-D builder).
        if not _plain_abs_dist_probe(localization, 2):
            import logging

            logging.getLogger(__name__).warning(
                "local_method='window' ignores the localization's dist_fn: "
                "the 2-D window kernel uses per-dimension |obs - grid| "
                "coordinate distances and masks torus-wrapped candidates "
                "(non-periodic domains only). Use local_method='topk' for "
                "periodic or custom distances."
            )

    def local_fn(state_loc, vals, var, lidx, ocoords, valid, gcoords, rho,
                 *, degree):
        k, tr, tc = state_loc.shape
        state_flat = state_loc.reshape(k, tr * tc)
        ens_obs = jnp.take(state_flat, lidx, axis=-1)
        mean = jnp.mean(ens_obs, axis=0, keepdims=True)
        if var.ndim == 2:
            # per-tile correlated R block (see halo_letkf_analysis)
            from jax.scipy.linalg import solve_triangular

            chol = jnp.linalg.cholesky(var)
            perts = solve_triangular(
                chol, (ens_obs - mean).T, lower=True
            ).T * valid
            innov = solve_triangular(
                chol, vals - mean[0], lower=True
            ) * valid
        else:
            rcinv = 1.0 / jnp.sqrt(var)
            perts = (ens_obs - mean) * rcinv * valid
            innov = (vals - mean[0]) * rcinv * valid
        if local_method == "window":
            # Windowed local solve: per-tile monolithic 2-D window kernel
            # on the halo candidates (band/window selection + product taper
            # + Chebyshev solve fused; the kernel re-sorts obs internally,
            # so only wrap/pad masking is needed). Obs coordinate columns
            # must be (x, y[, extra...]) matching the grid coords.
            from tpu_assim.ops.pallas.letkf import (
                letkf_window_analysis_fused_2d,
            )

            big = jnp.asarray(jnp.finfo(jnp.float32).max, ocoords.dtype)
            ocoords_w = jnp.where(valid[:, None] > 0, ocoords, big)
            packed_w = jnp.concatenate(
                [perts, innov[None, :], ocoords_w.T], axis=0
            )
            cand_w = _ring_halo_2d_masked(
                packed_w, k + 1, row_axis, col_axis, m_rows, m_cols,
                halo_r, halo_c,
            )
            mean_s = jnp.mean(state_flat, axis=0)
            sp = state_flat - mean_s[None, :]
            reg = jnp.asarray(k - 1, state_loc.dtype) / rho
            n_dims = ocoords.shape[1]
            extra = tuple(
                float(_radii[j] if j < _radii.size else _radii[-1])
                for j in range(2, n_dims)
            )
            gflat2 = gcoords.reshape(tr * tc, -1)
            out = letkf_window_analysis_fused_2d(
                cand_w[:k], cand_w[k], cand_w[k + 1:].T, gflat2,
                sp, mean_s, reg, _win_rx, _win_ry, k,
                obs_block=obs_block, nb=max_obs, degree=degree,
                taper=_win_taper, epsilon=_win_eps, extra_radii=extra,
            )
            return out.reshape(k, tr, tc).astype(state_loc.dtype)

        packed = jnp.concatenate(
            [perts, innov[None, :], valid[None, :], ocoords.T], axis=0
        )
        cand = _ring_halo_2d(packed, row_axis, col_axis, m_rows, m_cols,
                             halo_r, halo_c)
        c_perts = cand[:k]
        c_innov = cand[k]
        c_valid = cand[k + 1]
        c_coords = cand[k + 2:].T
        gflat = gcoords.reshape(tr * tc, -1)
        grid_info = jnp.concatenate(
            [jnp.zeros((gflat.shape[0], 1), gflat.dtype), gflat], axis=1)
        obs_info = jnp.concatenate(
            [jnp.zeros((c_coords.shape[0], 1), c_coords.dtype), c_coords],
            axis=1)
        w_loc = localization.taper_weights(grid_info, obs_info)
        w_loc = w_loc * c_valid[None, :]
        kk = min(max_obs, w_loc.shape[-1])
        top_w, top_idx = jax.lax.top_k(w_loc, kk)
        if kk < max_obs:
            pad = max_obs - kk
            top_w = jnp.pad(top_w, ((0, 0), (0, pad)))
            top_idx = jnp.pad(top_idx, ((0, 0), (0, pad)))
        mean_s = jnp.mean(state_flat, axis=0)
        sp = state_flat - mean_s[None, :]
        if use_pallas:
            from tpu_assim.ops.localization import safe_sqrt
            from tpu_assim.ops.pallas.letkf import letkf_nbh_analysis_cheb

            sw = safe_sqrt(top_w).astype(c_perts.dtype)
            zh = c_perts[:, top_idx].transpose(2, 0, 1) * sw.T[:, None, :]
            yh = c_innov[top_idx].T * sw.T
            reg = jnp.asarray((k - 1) / inf_factor, c_perts.dtype)
            out = letkf_nbh_analysis_cheb(
                zh, yh, sp, mean_s, reg, k, degree=degree
            ).astype(state_loc.dtype)
        else:
            weights = letkf_weights_nbh(
                c_perts, c_innov, top_idx.astype(jnp.int32),
                top_w.astype(c_perts.dtype), rho,
                method=method, newton_iters=newton_iters,
            )
            out = mean_s[None, :] + jnp.einsum(
                "kg,gkm->mg", sp, weights,
                precision=jax.lax.Precision.HIGHEST)
        return out.reshape(k, tr, tc)

    def _build(degree: int):
        import functools

        lf = functools.partial(local_fn, degree=degree)

        @jax.jit
        def analysis_fn_inner(state_data, obs_vals, obs_var, obs_local_idx,
                              obs_coords, obs_valid, grid_coords):
            var_spec = (
                P((row_axis, col_axis), None)
                if obs_var.ndim == 2
                else P((row_axis, col_axis))
            )
            sharded = jax.shard_map(
                lf,
                mesh=mesh,
                in_specs=(
                    P(None, row_axis, col_axis),      # state [k, R, C]
                    P((row_axis, col_axis)),          # obs vals (tile-major)
                    var_spec,                         # obs var
                    P((row_axis, col_axis)),
                    P((row_axis, col_axis), None),
                    P((row_axis, col_axis)),
                    P(row_axis, col_axis, None),      # grid coords [R, C, d]
                    P(),
                ),
                out_specs=P(None, row_axis, col_axis),
                # see halo_letkf_analysis: check disabled only for Pallas
                check_vma=not (use_pallas or local_method == 'window'),
            )
            return sharded(
                state_data, obs_vals, obs_var, obs_local_idx, obs_coords,
                obs_valid, grid_coords,
                jnp.asarray(inf_factor, state_data.dtype),
            )

        return analysis_fn_inner

    _cache: dict = {}
    needs_degree = use_pallas or local_method == "window"
    n_tiles_mesh = int(m_rows) * int(m_cols)

    def _check_support_2d(obs_coords, obs_valid, grid_coords):
        """Per-shard exact in-support precheck: each tile's kernel sees the
        valid obs of its (2hr+1) x (2hc+1) tile neighborhood (torus-wrapped
        sources are sentinel-masked out on non-periodic domains and pad
        slots carry out-of-band sentinel coordinates), tiled over the
        LOCAL flat grid exactly like the kernel."""
        import numpy as _np

        from tpu_assim.ops.pallas.letkf import max_in_support_2d

        coords = _np.asarray(obs_coords)
        valid = _np.asarray(obs_valid) > 0
        grid = _np.asarray(grid_coords)
        R, C = grid.shape[0], grid.shape[1]
        tr, tc = R // int(m_rows), C // int(m_cols)
        p = coords.shape[0] // n_tiles_mesh
        worst = 0
        for i in range(int(m_rows)):
            for j in range(int(m_cols)):
                cand = []
                for di in range(-halo_r, halo_r + 1):
                    si = i + di
                    if si < 0 or si >= int(m_rows):
                        continue  # wrapped: sentinel-masked in the kernel
                    for dj in range(-halo_c, halo_c + 1):
                        sj = j + dj
                        if sj < 0 or sj >= int(m_cols):
                            continue
                        t = si * int(m_cols) + sj
                        sl = slice(t * p, (t + 1) * p)
                        cand.append(coords[sl][valid[sl], :2])
                gloc = grid[i * tr:(i + 1) * tr,
                            j * tc:(j + 1) * tc].reshape(tr * tc, -1)[:, :2]
                if cand:
                    cxy = _np.concatenate(cand, axis=0)
                    if cxy.shape[0]:
                        worst = max(worst, max_in_support_2d(
                            cxy, gloc, _win_rx, _win_ry, taper=_win_taper,
                            epsilon=_win_eps,
                        ))
        return worst

    def analysis_fn(state_data, obs_vals, obs_var, obs_local_idx, obs_coords,
                    obs_valid, grid_coords):
        concrete = not any(
            isinstance(a, jax.core.Tracer)
            for a in (state_data, obs_vals, obs_var, obs_coords, obs_valid,
                      grid_coords)
        )
        if local_method == "window" and max_obs_strict and concrete:
            worst = _check_support_2d(obs_coords, obs_valid, grid_coords)
            if worst > max_obs:
                raise ValueError(
                    f"a grid column may see {worst} in-support band obs "
                    f"but max_obs={max_obs}: the 2-D window selection "
                    f"would truncate. Raise max_obs to >= {worst} or pass "
                    "max_obs_strict=False."
                )
        degree = cheb_degree
        if degree is None and needs_degree:
            if not concrete:
                raise ValueError(
                    "cheb_degree=None (auto) needs concrete inputs; pin "
                    "cheb_degree=<int> under an outer jit (validate the "
                    "pin against a concrete auto call first)"
                )
            import numpy as _np

            # tile-major state flattening so the auto-degree's global-index
            # reconstruction matches shard_observations_2d's bucketing
            sd = _np.asarray(state_data)
            k = sd.shape[0]
            R, C = sd.shape[1], sd.shape[2]
            tr, tc = R // int(m_rows), C // int(m_cols)
            sd_tm = sd.reshape(k, int(m_rows), tr, int(m_cols), tc)
            sd_tm = sd_tm.transpose(0, 1, 3, 2, 4).reshape(k, R * C)
            degree = _halo_auto_degree(
                sd_tm, obs_vals, obs_var, obs_local_idx, obs_coords,
                obs_valid, n_tiles_mesh, max_obs, inf_factor,
                consecutive=False,
            )
        elif degree is None:
            degree = 16  # unused by the weight-based local solves
        fn = _cache.get(degree)
        if fn is None:
            fn = _cache[degree] = _build(degree)
        return fn(state_data, obs_vals, obs_var, obs_local_idx, obs_coords,
                  obs_valid, grid_coords)

    return analysis_fn
