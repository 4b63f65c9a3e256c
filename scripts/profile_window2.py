#!/usr/bin/env python
"""Follow-up experiments for the fused window kernel.

A. reps-inside-jit (fori_loop) timing of the full analysis — on-device
   steady state with ONE dispatch (isolates the axon-tunnel per-call cost).
B. pack-building-only cost (the XLA ops upstream of the pallas_call).
C. Gram row-grouping variants (fewer, larger VPU ops).
D. empty-body kernel with the same grid/BlockSpecs (fixed per-tile cost).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

from bench import build_workload
from tpu_assim.analysis import make_letkf_analysis
from tpu_assim.ops.localization import GaspariCohn
from tpu_assim.ops.pallas.letkf import letkf_window_analysis_fused

f32 = jnp.float32


def loop_time(step_loop, args, reps=20, trials=4):
    """step_loop(acc, reps, *args) runs ``reps`` chained analyses inside
    one jitted fori_loop. Returns per-analysis seconds."""
    acc0 = jnp.asarray(0.0, f32)
    np.asarray(step_loop(acc0, *args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = step_loop(acc0, *args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def chain_time(step, args, reps=20, trials=4):
    acc0 = jnp.asarray(0.0, f32)
    np.asarray(step(acc0, *args))
    best = float("inf")
    for _ in range(trials):
        acc = acc0
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = step(acc, *args)
        np.asarray(acc)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    ens_size, g, o, radius, inf = 40, 10000, 1000, 20.0, 1.1
    state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = \
        build_workload(ens_size, g, o)

    def dist_fn(gc, oi):
        return jnp.abs(oi[:, 1] - gc[1])[None, :]

    loc = GaspariCohn((radius,), dist_fn)
    analyse = make_letkf_analysis(loc, inf_factor=inf, chunksize=None,
                                  method="fused1d", max_obs=16,
                                  cheb_degree=12)
    args = tuple(jnp.asarray(a) for a in (
        state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords))

    REPS = 20

    @jax.jit
    def loop_full(acc, *w):
        def body(_, a):
            return jnp.sum(analyse(w[0] + a * 1e-9, *w[1:])) * 1e-12
        return jax.lax.fori_loop(0, REPS, body, acc)

    @jax.jit
    def chained_full(acc, *w):
        return jnp.sum(analyse(w[0] + acc * 1e-9, *w[1:])) * 1e-12

    # throwaway (tunnel warm-up)
    chain_time(chained_full, args, reps=5, trials=1)

    t_chain = chain_time(chained_full, args, reps=REPS)
    print(f"A. per-call dispatch chain   : {t_chain*1e3:8.3f} ms")
    t_loop = loop_time(loop_full, args, reps=REPS)
    print(f"A. fori_loop inside one jit  : {t_loop*1e3:8.3f} ms"
          f"   (dispatch overhead {1e3*(t_chain-t_loop):+.3f})")

    # B. pack building only: replicate the blocked-pack XLA prologue
    from tpu_assim.ops.localization import taper_support_z

    rcinv = 1.0 / np.sqrt(obs_var)
    ens_obs = state[:, obs_idx]
    mean_obs = ens_obs.mean(0)
    perts = jnp.asarray((ens_obs - mean_obs) * rcinv)
    innov = jnp.asarray((obs_vals - mean_obs) * rcinv)
    obs_x = jnp.asarray(obs_coords[:, 0])
    grid_x = jnp.asarray(grid_coords[:, 0])

    tile, nb = 128, 16
    n_tiles = -(-g // tile)
    o_b = min(o, 2 * ((o * tile) // g) + 2 * nb)
    o_b = -(-max(o_b, 2 * nb) // 8) * 8
    sup = taper_support_z("gc2", 1e-5) * radius
    rows_pad = -(-(ens_size + 2) // 8) * 8

    @jax.jit
    def loop_pack(acc, p, i_, ox, gx):
        def body(_, a):
            gxp = jnp.pad(gx, ((0, n_tiles * tile - g),),
                          constant_values=gx[-1])
            tile_min = gxp.reshape(n_tiles, tile).min(axis=1)
            offs = jnp.minimum(
                jnp.searchsorted(ox, tile_min, method="sort") - nb,
                jnp.searchsorted(ox, tile_min - sup, side="right",
                                 method="sort"))
            offs = jnp.clip(offs, 0, o - 1).astype(jnp.int32)
            idx = offs[:, None] + jnp.arange(o_b, dtype=jnp.int32)[None, :]
            in_range = idx < o
            idx_c = jnp.minimum(idx, o - 1)
            big = jnp.asarray(jnp.finfo(f32).max, f32)
            obs_x_b = jnp.where(in_range, jnp.take(ox, idx_c), big)
            innov_b = jnp.where(in_range, jnp.take(i_, idx_c), 0.0)
            perts_b = jnp.where(
                in_range[:, None, :],
                jnp.take(p + a * 1e-9, idx_c, axis=1).transpose(1, 0, 2),
                0.0)
            pack = jnp.concatenate(
                [perts_b, innov_b[:, None, :], obs_x_b[:, None, :],
                 jnp.zeros((n_tiles, rows_pad - ens_size - 2, o_b), f32)],
                axis=1)
            return jnp.sum(pack) * 1e-12
        return jax.lax.fori_loop(0, REPS, body, acc)

    t_pack = loop_time(loop_pack, (perts, innov, obs_x, grid_x), reps=REPS)
    print(f"B. pack building only (loop) : {t_pack*1e3:8.3f} ms")

    # D. empty-body kernel, same grid + BlockSpecs + DMAs
    smean = state.mean(0)
    sperts = jnp.asarray((state - smean)[None])
    smean3 = jnp.asarray(smean, f32)[None, None, :]
    k = ens_size
    dp1 = 13
    pack0 = jnp.zeros((n_tiles, rows_pad, o_b), f32)
    scal = jnp.zeros((2,), f32)
    nodes0 = jnp.zeros((1, dp1), f32)
    dct0 = jnp.zeros((dp1, dp1), f32)

    def empty_kernel(scal_ref, nodes_ref, dct_ref, obs_ref, gridx_ref,
                     sp_ref, mean_ref, out_ref):
        out_ref[:] = sp_ref[:] + obs_ref[0, 0, 0] + mean_ref[:]

    def empty_call(pk, gx2, sp_, m3):
        return pl.pallas_call(
            empty_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, dp1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dp1, dp1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_pad, o_b), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, k, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, k, g + (-g) % tile), f32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(scal, nodes0, dct0, pk, gx2, sp_, m3)

    gx_pad = jnp.pad(grid_x, ((0, (-g) % tile),))[None, :]
    sp_pad = jnp.pad(sperts, ((0, 0), (0, 0), (0, (-g) % tile)))
    m3_pad = jnp.pad(smean3, ((0, 0), (0, 0), (0, (-g) % tile)))

    @jax.jit
    def loop_empty(acc, pk, gx2, sp_, m3):
        def body(_, a):
            return jnp.sum(empty_call(pk + a * 1e-9, gx2, sp_, m3)) * 1e-12
        return jax.lax.fori_loop(0, REPS, body, acc)

    t_empty = loop_time(loop_empty, (pack0, gx_pad, sp_pad, m3_pad),
                        reps=REPS)
    print(f"D. empty-body kernel (loop)  : {t_empty*1e3:8.3f} ms"
          f"   ({t_empty*1e6/n_tiles:6.2f} us/tile fixed)")

    # A2: raw fused kernel inside loop (no class API) for reference
    reg = jnp.asarray((ens_size - 1) / inf, f32)
    smean_j = jnp.asarray(smean)
    sperts_j = jnp.asarray(state - smean)

    @jax.jit
    def loop_raw(acc, p, i_, ox, gx, sp_, m_, r_):
        def body(_, a):
            out = letkf_window_analysis_fused(
                p + a * 1e-9, i_, ox, gx, sp_, m_, r_, radius, ens_size,
                nb=16, degree=12)
            return jnp.sum(out) * 1e-12
        return jax.lax.fori_loop(0, REPS, body, acc)

    raw_args = (perts, innov, obs_x, grid_x, sperts_j, smean_j, reg)
    t_raw = loop_time(loop_raw, raw_args, reps=REPS)
    print(f"A2. raw kernel in fori_loop  : {t_raw*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
