#!/usr/bin/env python
"""Separate per-jit-call (tunnel/launch) overhead from per-rep device cost:
time the same bodies at REPS = 20 / 100 / 400. A fixed per-call cost C and
per-rep cost r give t(R) = C/R + r -> r from the slope."""

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

f32 = jnp.float32


def timed(fn, args, reps, trials=3):
    acc0 = jnp.asarray(0.0, f32)
    np.asarray(fn(acc0, jnp.asarray(reps), *args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(fn(acc0, jnp.asarray(reps), *args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ens_size, g, o, radius, inf = 40, 10000, 1000, 20.0, 1.1
    state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = \
        build_workload(ens_size, g, o)
    k, tile = ens_size, 128
    n_tiles = -(-g // tile)
    gp = n_tiles * tile
    sp = jnp.asarray(np.pad(state - state.mean(0), ((0, 0), (0, gp - g))),
                     f32)[None]

    def dist_fn(gc, oi):
        return jnp.abs(oi[:, 1] - gc[1])[None, :]

    analyse = make_letkf_analysis(GaspariCohn((radius,), dist_fn),
                                  inf_factor=inf, chunksize=None,
                                  method="fused1d", max_obs=16,
                                  cheb_degree=12)
    args_full = tuple(jnp.asarray(a) for a in (
        state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords))

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
    def loop_empty(acc, reps, sp_):
        def body(_, a):
            return jnp.sum(call3(sp_ + a * 1e-9)) * 1e-12
        return jax.lax.fori_loop(0, reps, body, acc)

    @jax.jit
    def loop_xla(acc, reps, sp_):
        def body(_, a):
            return jnp.sum((sp_ + a * 1e-9) ** 2) * 1e-12
        return jax.lax.fori_loop(0, reps, body, acc)

    @jax.jit
    def loop_full(acc, reps, *w):
        def body(_, a):
            return jnp.sum(analyse(w[0] + a * 1e-9, *w[1:])) * 1e-12
        return jax.lax.fori_loop(0, reps, body, acc)

    timed(loop_xla, (sp,), 20)  # throwaway

    for name, fn, a in [("pure-XLA square+sum", loop_xla, (sp,)),
                        ("empty pallas kernel", loop_empty, (sp,)),
                        ("full fused analysis", loop_full, args_full)]:
        ts = {}
        for reps in (20, 100, 400):
            ts[reps] = timed(fn, a, reps)
        # per-rep from the 100->400 slope, per-call intercept from reps=20
        r = (ts[400] - ts[100]) / 300.0
        c = ts[20] - 20 * r
        print(f"{name:22s}: total(20)={ts[20]*1e3:8.2f} "
              f"total(100)={ts[100]*1e3:8.2f} total(400)={ts[400]*1e3:9.2f} ms"
              f"  -> per-rep {r*1e3:7.3f} ms, per-call {c*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
