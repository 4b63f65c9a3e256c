#!/usr/bin/env python
"""Third round: clean attribution with a PREBUILT pack.

1. kernel-only (prebuilt pack, fori_loop reps)      -> pallas cost alone
2. empty-body kernel, same specs                    -> fixed per-tile cost
3. empty-body kernel, sp in/out only                -> DMA-count effect
4. empty-body kernel, grid=(1,) whole array         -> grid-loop overhead
5. kernel-only with Gram / Clenshaw stubs           -> stage costs
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
from tpu_assim.ops.localization import taper_support_z
from tpu_assim.ops.pallas.letkf import (
    _cheb_nodes_dct, _letkf_window_kernel, _resolve_interpret,
)
from profile_window import _kernel_abl

f32 = jnp.float32
REPS = 20


def loop_time(fn, args, trials=4):
    acc0 = jnp.asarray(0.0, f32)
    np.asarray(fn(acc0, *args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(fn(acc0, *args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    ens_size, g, o, radius, inf = 40, 10000, 1000, 20.0, 1.1
    state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = \
        build_workload(ens_size, g, o)
    k = ens_size
    tile, nb, degree = 128, 16, 12
    n_tiles = -(-g // tile)
    gp = n_tiles * tile
    o_b = min(o, 2 * ((o * tile) // g) + 2 * nb)
    o_b = -(-max(o_b, 2 * nb) // 8) * 8
    rows_pad = -(-(k + 2) // 8) * 8
    dp1 = degree + 1
    sup = taper_support_z("gc2", 1e-5) * radius

    # ---- build the pack on host (numpy), once --------------------------
    rcinv = 1.0 / np.sqrt(obs_var)
    ens_obs = state[:, obs_idx]
    mean_obs = ens_obs.mean(0)
    perts = (ens_obs - mean_obs) * rcinv
    innov = (obs_vals - mean_obs) * rcinv
    obs_x = obs_coords[:, 0]
    grid_x = np.pad(grid_coords[:, 0], (0, gp - g),
                    constant_values=grid_coords[-1, 0])
    smean = state.mean(0)
    sperts = np.pad(state - smean, ((0, 0), (0, gp - g)))
    smean_p = np.pad(smean, (0, gp - g))

    tile_min = grid_x.reshape(n_tiles, tile).min(axis=1)
    offs = np.minimum(np.searchsorted(obs_x, tile_min) - nb,
                      np.searchsorted(obs_x, tile_min - sup, side="right"))
    offs = np.clip(offs, 0, o - 1).astype(np.int32)
    idx = offs[:, None] + np.arange(o_b, dtype=np.int32)[None, :]
    in_range = idx < o
    idx_c = np.minimum(idx, o - 1)
    big = np.float32(np.finfo(np.float32).max)
    obs_x_b = np.where(in_range, obs_x[idx_c], big)
    innov_b = np.where(in_range, innov[idx_c], 0.0)
    perts_b = np.where(in_range[:, None, :],
                       perts[:, idx_c].transpose(1, 0, 2), 0.0)
    pack = np.concatenate(
        [perts_b, innov_b[:, None, :], obs_x_b[:, None, :],
         np.zeros((n_tiles, rows_pad - k - 2, o_b), np.float32)],
        axis=1).astype(np.float32)

    nodes, dct = _cheb_nodes_dct(degree)
    scal = np.array([(k - 1) / inf, radius], np.float32)
    support_z = taper_support_z("gc2", 1e-5)

    j_pack = jnp.asarray(pack)
    j_gx = jnp.asarray(grid_x, f32)[None, :]
    j_sp = jnp.asarray(sperts, f32)[None]
    j_m3 = jnp.asarray(smean_p, f32)[None, None, :]
    j_scal = jnp.asarray(scal)
    j_nodes = jnp.asarray(nodes)[None, :]
    j_dct = jnp.asarray(dct)

    specs = dict(
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
        out_shape=jax.ShapeDtypeStruct((1, k, gp), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    def run_kernel(kern, name, extra=""):
        call = pl.pallas_call(kern, **specs)

        @jax.jit
        def looped(acc, pk, gx, sp_, m3):
            def body(_, a):
                out = call(j_scal, j_nodes, j_dct, pk + a * 1e-9, gx,
                           sp_, m3)
                return jnp.sum(out) * 1e-12
            return jax.lax.fori_loop(0, REPS, body, acc)

        t = loop_time(looped, (j_pack, j_gx, j_sp, j_m3))
        print(f"{name:36s}: {t*1e3:8.3f} ms{extra}")
        return t

    real = functools.partial(
        _letkf_window_kernel, ens_size=k, degree=degree, nb=nb,
        epsilon=1e-5, taper="gc2", support_z=support_z, strict=True)

    # throwaway
    run_kernel(real, "throwaway (warm-up)")
    t_k = run_kernel(real, "1. kernel-only, prebuilt pack")

    for abl, label in [
        (("gram",), "5a. kernel-only, Gram stubbed"),
        (("clenshaw",), "5b. kernel-only, Clenshaw stubbed"),
        (("gather",), "5c. kernel-only, selection stubbed"),
        (("gather", "taper", "gram", "clenshaw"), "5d. all stages stubbed"),
    ]:
        kern = functools.partial(
            _kernel_abl, ens_size=k, degree=degree, nb=nb, epsilon=1e-5,
            taper="gc2", support_z=support_z, ablate=abl)
        run_kernel(kern, label)

    def empty_kernel(scal_ref, nodes_ref, dct_ref, obs_ref, gridx_ref,
                     sp_ref, mean_ref, out_ref):
        out_ref[:] = sp_ref[:] + obs_ref[0, 0, 0] + mean_ref[:]

    t_e = run_kernel(empty_kernel, "2. empty body, same specs",
                     f"   ({0:.0f})")

    # 3. sp in/out only
    def sp_only_kernel(sp_ref, out_ref):
        out_ref[:] = sp_ref[:] * 1.0000001

    call3 = pl.pallas_call(
        sp_only_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, k, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k, gp), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    @jax.jit
    def looped3(acc, sp_):
        def body(_, a):
            return jnp.sum(call3(sp_ + a * 1e-9)) * 1e-12
        return jax.lax.fori_loop(0, REPS, body, acc)

    t3 = loop_time(looped3, (j_sp,))
    print(f"{'3. empty, sp in/out only':36s}: {t3*1e3:8.3f} ms")

    # 4. grid=(1,) whole-array empty
    call4 = pl.pallas_call(
        sp_only_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, k, gp), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k, gp), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k, gp), f32),
    )

    @jax.jit
    def looped4(acc, sp_):
        def body(_, a):
            return jnp.sum(call4(sp_ + a * 1e-9)) * 1e-12
        return jax.lax.fori_loop(0, REPS, body, acc)

    t4 = loop_time(looped4, (j_sp,))
    print(f"{'4. empty, grid=(1,) whole array':36s}: {t4*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
