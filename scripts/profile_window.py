#!/usr/bin/env python
"""Stage attribution for the fused 1-D window kernel on the real chip.

Times, with data-dependent on-device chaining (bench.py methodology):
  1. the full class-API jitted analysis (what bench.py measures),
  2. the raw ``letkf_window_analysis_fused`` on prebuilt normalized inputs,
  3. ablated kernel variants (selection / Gram / Clenshaw stubbed out) to
     attribute per-tile time to kernel stages.

The first timed entry in a fresh process reads bogus-low (tunnel warm-up);
a throwaway timing runs first.
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
from tpu_assim.ops.localization import GaspariCohn, taper_support_z
from tpu_assim.ops.pallas.letkf import (
    _cheb_nodes_dct, _cheb_solve_apply, _taper_poly, _resolve_interpret,
    letkf_window_analysis_fused,
)

f32 = jnp.float32


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


# --- ablatable kernel (same math as _letkf_window_kernel) -----------------

def _kernel_abl(scal_ref, nodes_ref, dct_ref, obs_ref, gridx_ref, sp_ref,
                mean_ref, out_ref, *, ens_size, degree, nb, epsilon, taper,
                support_z, ablate):
    reg = scal_ref[0]
    radius = scal_ref[1]
    pack = obs_ref[:][0]
    k_rows = ens_size
    perts = pack[:k_rows]
    grid_x = gridx_ref[:]
    sp = sp_ref[:]
    n_obs = perts.shape[1]
    obs_x = pack[k_rows + 1:k_rows + 2]

    if "sel" in ablate:
        # stub: fixed window [0, nb) for every column
        start = jnp.zeros((grid_x.shape[1],), jnp.int32)
    else:
        ox_col = obs_x.reshape(-1, 1)
        cmp = jnp.where(ox_col <= grid_x, 1.0, 0.0)
        center = jnp.sum(cmp, axis=0)
        sup = jnp.asarray(support_z, f32) * radius
        low = jnp.sum(jnp.where(ox_col <= grid_x - sup, 1.0, 0.0), axis=0)
        high = jnp.sum(jnp.where(ox_col < grid_x + sup, 1.0, 0.0), axis=0)
        start = jnp.clip(center - (nb // 2), high - float(nb), low)
        start = jnp.clip(start, 0.0, float(n_obs - nb)).astype(jnp.int32)

    t_cols = grid_x.shape[1]
    if "gather" in ablate:
        # NOTE: stubbing the gather makes ``start`` dead, so Mosaic also
        # DCEs the rank compare — this variant removes rank+onehot+matmul.
        zz = jnp.broadcast_to(pack[:ens_size, :nb][:, :, None],
                              (ens_size, nb, t_cols))
        yv = jnp.zeros((nb, t_cols), f32)
        ox = jnp.broadcast_to(grid_x, (nb, t_cols))
    else:
        iota_o = jax.lax.broadcasted_iota(jnp.int32, (n_obs, 1), 0)
        slot = jax.lax.broadcasted_iota(jnp.int32, (nb, t_cols), 0)
        sel_all = (start[None, :] + slot).reshape(1, nb * t_cols)
        onehot = jnp.where(iota_o == sel_all, 1.0, 0.0)
        hp = jax.lax.Precision.HIGHEST
        sel = jax.lax.dot_general(
            pack[:ens_size + 2], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hp,
        ).reshape(ens_size + 2, nb, t_cols)
        zz = sel[:ens_size]
        yv = sel[ens_size]
        ox = sel[ens_size + 1]

    if "taper" in ablate:
        sw = jnp.ones((nb, t_cols), f32)
    else:
        z = jnp.abs(ox - grid_x) / radius
        w = _taper_poly(z, taper, epsilon)
        sw = jnp.sqrt(w)
    zh = jnp.swapaxes(zz, 0, 1) * sw[:, None, :]
    yh = yv * sw

    out_ref[:] = _solve_abl(
        nodes_ref[:], dct_ref[:], zh, yh, sp, mean_ref[:], reg,
        ens_size, degree, ablate,
    )


def _solve_abl(nodes, dct_mat, zh, yh, sp, mean, reg, ens_size, degree,
               ablate):
    """_cheb_solve_apply with 'gram' / 'clenshaw' ablation switches."""
    nb = zh.shape[0]
    ns = sp.shape[0]
    nb_iota = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    nb_iota_c = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    eye_nb = (nb_iota == nb_iota_c).astype(f32)[:, :, None]
    if "gram" in ablate:
        t_cols = zh.shape[2]
        s = jnp.broadcast_to(eye_nb, (nb, nb, t_cols)) * (1.0 + yh[0])
    else:
        s = jnp.stack(
            [jnp.sum(zh[n][None, :, :] * zh, axis=1) for n in range(nb)],
            axis=0)
    inf_norm = jnp.max(jnp.sum(jnp.abs(s), axis=1), axis=0)
    trace = jnp.sum(s * eye_nb, axis=(0, 1))
    lam_ub = 1.0 + jnp.minimum(inf_norm, trace) / reg
    lam_ub = jnp.maximum(lam_ub, 1.05)
    t_nodes = nodes.reshape(-1, 1)
    half_w = 0.5 * (lam_ub - 1.0)[None, :]
    x_nodes = (1.0 + half_w) + half_w * t_nodes
    f1x = 1.0 / x_nodes
    sq = jnp.sqrt(x_nodes)
    f2x = 1.0 / (sq * (1.0 + sq))
    hp = jax.lax.Precision.HIGHEST
    c1 = jnp.einsum("mj,jc->mc", dct_mat, f1x,
                    preferred_element_type=f32, precision=hp)
    c2 = jnp.einsum("mj,jc->mc", dct_mat, f2x,
                    preferred_element_type=f32, precision=hp)
    c_all = jnp.concatenate(
        [c1[:, None, :],
         jnp.broadcast_to(c2[:, None, :],
                          c2.shape[:1] + (ns,) + c2.shape[1:])], axis=1)
    a2_sc = (2.0 / (lam_ub - 1.0) / reg)[None, :]

    def xt(vec):
        sv = jnp.sum(s[None] * vec[:, None, :, :], axis=2)
        return a2_sc * sv - vec

    u = jnp.stack(
        [jnp.sum(zh * sp[i][None, :, :], axis=1) for i in range(ns)], axis=0)
    w_all = jnp.concatenate([yh[None], u], axis=0)
    if "clenshaw" in ablate:
        res = c_all[0][:, None, :] * w_all
    else:
        b1 = jnp.zeros_like(w_all)
        b2 = jnp.zeros_like(w_all)
        for m_i in range(degree, 0, -1):
            b0 = c_all[m_i][:, None, :] * w_all + 2.0 * xt(b1) - b2
            b2, b1 = b1, b0
        res = c_all[0][:, None, :] * w_all + xt(b1) - b2
    q = res[0]
    v = res[1:]
    alpha = jnp.sqrt((ens_size - 1.0) / reg)
    mean_upd = jnp.sum(u * q[None], axis=1, keepdims=True) / reg
    zv = jnp.stack(
        [jnp.sum(zh * v[i][:, None, :], axis=0) for i in range(ns)], axis=0)
    return mean + mean_upd + alpha * sp - (alpha / reg) * zv


def window_abl(perts, innov, obs_x, grid_x, sp, mean, reg, radius,
               ens_size, nb=16, degree=12, tile=128, epsilon=1e-5,
               obs_block=0, taper="gc2", ablate=()):
    """Unblocked-pack variant driver with stage ablation."""
    k, o = perts.shape
    g = grid_x.shape[0]
    sp = sp[None]
    mean = mean[None]
    n_tiles = -(-g // tile)
    pad = n_tiles * tile - g
    if pad:
        grid_x = jnp.pad(grid_x, ((0, pad),), constant_values=grid_x[-1])
        sp = jnp.pad(sp, ((0, 0), (0, 0), (0, pad)))
        mean = jnp.pad(mean, ((0, 0), (0, pad)))
    scal = jnp.stack([jnp.asarray(reg, f32),
                      jnp.asarray(radius, f32)]).reshape(2,)
    mean3 = mean.astype(f32)[:, None, :]

    if obs_block == 0:
        obs_block = min(o, 2 * ((o * tile) // max(g, 1)) + 2 * nb)
        obs_block = max(obs_block, 2 * nb)
        obs_block = -(-obs_block // 8) * 8
    o_b = min(obs_block, o)

    nodes, dct = _cheb_nodes_dct(degree)
    support_z = taper_support_z(taper, epsilon)
    kernel = functools.partial(
        _kernel_abl, ens_size=ens_size, degree=degree, nb=nb,
        epsilon=epsilon, taper=taper, support_z=support_z, ablate=ablate,
    )
    dp1 = degree + 1
    rows = k + 2
    rows_pad = -(-rows // 8) * 8
    gp = grid_x.shape[0]
    n_tiles = gp // tile
    sup = jnp.asarray(support_z, f32) * radius

    # per-tile blocks (same as _window_pallas blocked path)
    tile_min = grid_x.reshape(n_tiles, tile).min(axis=1)
    offs = jnp.minimum(
        jnp.searchsorted(obs_x, tile_min, method="sort") - nb,
        jnp.searchsorted(obs_x, tile_min - sup, side="right",
                         method="sort"),
    )
    offs = jnp.clip(offs, 0, max(o - 1, 0)).astype(jnp.int32)
    idx = offs[:, None] + jnp.arange(o_b, dtype=jnp.int32)[None, :]
    in_range = idx < o
    idx_c = jnp.minimum(idx, o - 1)
    big = jnp.asarray(jnp.finfo(f32).max, f32)
    obs_x_b = jnp.where(in_range, jnp.take(obs_x, idx_c), big)
    innov_b = jnp.where(in_range, jnp.take(innov, idx_c), 0.0)
    perts_b = jnp.where(
        in_range[:, None, :],
        jnp.take(perts, idx_c, axis=1).transpose(1, 0, 2), 0.0)
    pack = jnp.concatenate(
        [perts_b, innov_b[:, None, :], obs_x_b[:, None, :],
         jnp.zeros((n_tiles, rows_pad - rows, o_b), f32)], axis=1)

    out = pl.pallas_call(
        kernel,
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
        interpret=_resolve_interpret(None),
    )(scal, jnp.asarray(nodes)[None, :], jnp.asarray(dct), pack,
      grid_x[None, :], sp, mean3)
    return out[0, :, :g]


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

    # prebuilt normalized inputs for the raw kernel
    rcinv = 1.0 / np.sqrt(obs_var)
    ens_obs = state[:, obs_idx]
    mean_obs = ens_obs.mean(0)
    perts = jnp.asarray((ens_obs - mean_obs) * rcinv)
    innov = jnp.asarray((obs_vals - mean_obs) * rcinv)
    obs_x = jnp.asarray(obs_coords[:, 0])
    grid_x = jnp.asarray(grid_coords[:, 0])
    smean = state.mean(0)
    sperts = jnp.asarray(state - smean)
    smean = jnp.asarray(smean)
    reg = jnp.asarray((ens_size - 1) / inf, f32)

    @jax.jit
    def full(acc, *w):
        return jnp.sum(analyse(w[0] + acc * 1e-9, *w[1:])) * 1e-12

    @jax.jit
    def raw(acc, p, i_, ox, gx, sp_, m_, r_):
        out = letkf_window_analysis_fused(
            p + acc * 1e-9, i_, ox, gx, sp_, m_, r_, radius, ens_size,
            nb=16, degree=12)
        return jnp.sum(out) * 1e-12

    raw_args = (perts, innov, obs_x, grid_x, sperts, smean, reg)

    def abl_step(ablate):
        @jax.jit
        def f(acc, p, i_, ox, gx, sp_, m_):
            out = window_abl(p + acc * 1e-9, i_, ox, gx, sp_, m_,
                             (ens_size - 1) / inf, radius, ens_size,
                             ablate=ablate)
            return jnp.sum(out) * 1e-12
        return f

    abl_args = raw_args[:-1]

    # throwaway first timing (tunnel warm-up artifact)
    chain_time(full, args, reps=5, trials=1)

    t_full = chain_time(full, args)
    print(f"full class-API analysis      : {t_full*1e3:8.3f} ms")
    t_raw = chain_time(raw, raw_args)
    print(f"raw fused window kernel      : {t_raw*1e3:8.3f} ms"
          f"   (API overhead {1e3*(t_full-t_raw):+.3f})")

    t0 = chain_time(abl_step(()), abl_args)
    print(f"ablation baseline (script)   : {t0*1e3:8.3f} ms")
    for abl, label in [
        (("sel",), "rank compare stubbed"),
        (("gather",), "rank+onehot+matmul stubbed"),
        (("taper",), "taper stubbed"),
        (("gram",), "Gram stubbed"),
        (("clenshaw",), "Clenshaw loop stubbed"),
        (("gather", "taper", "gram", "clenshaw"), "all stages stubbed"),
    ]:
        t = chain_time(abl_step(abl), abl_args)
        print(f"{label:29s}: {t*1e3:8.3f} ms   (stage {1e3*(t0-t):+.3f})")

    for deg, label in [(1, "degree=1"), (6, "degree=6"), (24, "degree=24")]:
        @jax.jit
        def f(acc, p, i_, ox, gx, sp_, m_, r_, _deg=deg):
            out = letkf_window_analysis_fused(
                p + acc * 1e-9, i_, ox, gx, sp_, m_, r_, radius, ens_size,
                nb=16, degree=_deg)
            return jnp.sum(out) * 1e-12
        t = chain_time(f, raw_args)
        print(f"raw kernel {label:18s}: {t*1e3:8.3f} ms")

    for nb_, label in [(8, "nb=8"), (32, "nb=32")]:
        @jax.jit
        def f(acc, p, i_, ox, gx, sp_, m_, r_, _nb=nb_):
            out = letkf_window_analysis_fused(
                p + acc * 1e-9, i_, ox, gx, sp_, m_, r_, radius, ens_size,
                nb=_nb, degree=12)
            return jnp.sum(out) * 1e-12
        t = chain_time(f, raw_args)
        print(f"raw kernel {label:18s}: {t*1e3:8.3f} ms")

    for tl, label in [(256, "tile=256"), (512, "tile=512")]:
        @jax.jit
        def f(acc, p, i_, ox, gx, sp_, m_, r_, _tl=tl):
            out = letkf_window_analysis_fused(
                p + acc * 1e-9, i_, ox, gx, sp_, m_, r_, radius, ens_size,
                nb=16, degree=12, tile=_tl)
            return jnp.sum(out) * 1e-12
        try:
            t = chain_time(f, raw_args)
            print(f"raw kernel {label:18s}: {t*1e3:8.3f} ms")
        except Exception as e:  # VMEM OOM etc.
            print(f"raw kernel {label:18s}: failed ({type(e).__name__})")


if __name__ == "__main__":
    main()
