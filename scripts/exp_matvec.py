#!/usr/bin/env python
"""A/B the _cheb_solve_apply contraction structure on the real chip.

v0: current (per-row broadcast-mult + sublane-reduce stacks)
v1: Clenshaw matvec as accumulation over m (sublane-slice + broadcast + FMA)
v2: v1 + Gram as accumulation over k
v3: v2 + u/zv as accumulation loops
Numerics: each variant is checked against v0 (f32 allclose) before timing.
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
    _cheb_nodes_dct, _taper_poly, _resolve_interpret,
)

f32 = jnp.float32
REPS1, REPS2 = 40, 200


def solve_variant(nodes, dct_mat, zz, sw, sp, mean, reg, ens_size, degree,
                  variant):
    """zz [k, nb, T] UNSCALED selected perts; sw [nb, T] sqrt taper;
    yv [nb, T] comes in via zz's extra row trick? -- no: passed separately
    by the caller through closure-free args below."""
    raise NotImplementedError


def make_kernel(ens_size, degree, nb, epsilon, taper, support_z, variant):
    def kernel(scal_ref, nodes_ref, dct_ref, obs_ref, gridx_ref, sp_ref,
               mean_ref, out_ref):
        reg = scal_ref[0]
        radius = scal_ref[1]
        pack = obs_ref[:][0]
        k_rows = ens_size
        perts = pack[:k_rows]
        grid_x = gridx_ref[:]
        sp = sp_ref[:]
        n_obs = perts.shape[1]
        obs_x = pack[k_rows + 1:k_rows + 2]

        ox_col = obs_x.reshape(-1, 1)
        cmp = jnp.where(ox_col <= grid_x, 1.0, 0.0)
        center = jnp.sum(cmp, axis=0)
        sup = jnp.asarray(support_z, f32) * radius
        low = jnp.sum(jnp.where(ox_col <= grid_x - sup, 1.0, 0.0), axis=0)
        high = jnp.sum(jnp.where(ox_col < grid_x + sup, 1.0, 0.0), axis=0)
        start = jnp.clip(center - (nb // 2), high - float(nb), low)
        start = jnp.clip(start, 0.0, float(n_obs - nb)).astype(jnp.int32)

        t_cols = grid_x.shape[1]
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
        z = jnp.abs(ox - grid_x) / radius
        w = _taper_poly(z, taper, epsilon)
        sw = jnp.sqrt(w)
        zzs = zz * sw[None, :, :]              # [k, nb, T], nb on sublane
        zh = jnp.swapaxes(zz, 0, 1) * sw[:, None, :]   # [nb, k, T]
        yh = yv * sw

        nodes = nodes_ref[:]
        dct_m = dct_ref[:]
        mean = mean_ref[:]
        ns = sp.shape[0]

        # ---- Gram ----
        if variant >= 2:
            s = zh[:, 0, :][:, None, :] * zzs[0][None, :, :]
            for kk in range(1, ens_size):
                s = s + zh[:, kk, :][:, None, :] * zzs[kk][None, :, :]
        else:
            s = jnp.stack(
                [jnp.sum(zh[n][None, :, :] * zh, axis=1)
                 for n in range(nb)], axis=0)

        nb_iota = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        nb_iota_c = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        eye_nb = (nb_iota == nb_iota_c).astype(f32)[:, :, None]
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
        c1 = jnp.einsum("mj,jc->mc", dct_m, f1x,
                        preferred_element_type=f32, precision=hp)
        c2 = jnp.einsum("mj,jc->mc", dct_m, f2x,
                        preferred_element_type=f32, precision=hp)
        c_all = jnp.concatenate(
            [c1[:, None, :],
             jnp.broadcast_to(c2[:, None, :],
                              c2.shape[:1] + (ns,) + c2.shape[1:])], axis=1)
        a2_sc = (2.0 / (lam_ub - 1.0) / reg)[None, :]

        if variant >= 1:
            def xt(vec):
                # S symmetric: s[m] is row m as [nb-sublane, T]
                sv = s[0][None, :, :] * vec[:, 0, :][:, None, :]
                for m in range(1, nb):
                    sv = sv + s[m][None, :, :] * vec[:, m, :][:, None, :]
                return a2_sc * sv - vec
        else:
            def xt(vec):
                sv = jnp.sum(s[None] * vec[:, None, :, :], axis=2)
                return a2_sc * sv - vec

        # ---- u ----
        if variant >= 3:
            u = zzs[0][None, :, :] * sp[:, 0, :][:, None, :]
            for kk in range(1, ens_size):
                u = u + zzs[kk][None, :, :] * sp[:, kk, :][:, None, :]
        else:
            u = jnp.stack(
                [jnp.sum(zh * sp[i][None, :, :], axis=1)
                 for i in range(ns)], axis=0)
        w_all = jnp.concatenate([yh[None], u], axis=0)

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
        if variant >= 3:
            zv = zh[0][None, :, :] * v[:, 0, :][:, None, :]
            for n in range(1, nb):
                zv = zv + zh[n][None, :, :] * v[:, n, :][:, None, :]
        else:
            zv = jnp.stack(
                [jnp.sum(zh * v[i][:, None, :], axis=0)
                 for i in range(ns)], axis=0)
        out_ref[:] = mean + mean_upd + alpha * sp - (alpha / reg) * zv

    return kernel


def main():
    ens_size, g, o, radius, inf = 40, 10000, 1000, 20.0, 1.1
    state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = \
        build_workload(ens_size, g, o)
    k = ens_size
    degree, epsilon = 12, 1e-5
    support_z = taper_support_z("gc2", epsilon)
    dp1 = degree + 1

    rcinv = 1.0 / np.sqrt(obs_var)
    ens_obs = state[:, obs_idx]
    mean_obs = ens_obs.mean(0)
    perts = (ens_obs - mean_obs) * rcinv
    innov = (obs_vals - mean_obs) * rcinv
    obs_x = obs_coords[:, 0]
    smean = state.mean(0)

    def build(nb, tile):
        n_tiles = -(-g // tile)
        gp = n_tiles * tile
        grid_x = np.pad(grid_coords[:, 0], (0, gp - g),
                        constant_values=grid_coords[-1, 0])
        sperts = np.pad(state - smean, ((0, 0), (0, gp - g)))
        smean_p = np.pad(smean, (0, gp - g))
        o_b = min(o, 2 * ((o * tile) // g) + 2 * nb)
        o_b = -(-max(o_b, 2 * nb) // 8) * 8
        rows_pad = -(-(k + 2) // 8) * 8
        sup = support_z * radius
        tile_min = grid_x.reshape(n_tiles, tile).min(axis=1)
        offs = np.minimum(
            np.searchsorted(obs_x, tile_min) - nb,
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
        return (n_tiles, gp, o_b, rows_pad,
                jnp.asarray(pack), jnp.asarray(grid_x, f32)[None, :],
                jnp.asarray(sperts, f32)[None],
                jnp.asarray(smean_p, f32)[None, None, :],
                jnp.asarray(scal), jnp.asarray(nodes)[None, :],
                jnp.asarray(dct))

    def make_call(variant, nb, tile):
        (n_tiles, gp, o_b, rows_pad, j_pack, j_gx, j_sp, j_m3, j_scal,
         j_nodes, j_dct) = build(nb, tile)
        kern = make_kernel(k, degree, nb, epsilon, "gc2", support_z,
                           variant)
        call = pl.pallas_call(
            kern,
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
        return call, (j_pack, j_gx, j_sp, j_m3, j_scal, j_nodes, j_dct)

    def run_once(call, a):
        j_pack, j_gx, j_sp, j_m3, j_scal, j_nodes, j_dct = a
        return call(j_scal, j_nodes, j_dct, j_pack, j_gx, j_sp, j_m3)

    def timed(call, a):
        @jax.jit
        def looped(acc, n):
            def body(_, x):
                out = run_once(call, (a[0] + x * 1e-9,) + a[1:])
                return jnp.sum(out) * 1e-12
            return jax.lax.fori_loop(0, n, body, acc)

        acc0 = jnp.asarray(0.0, f32)
        n1 = jnp.asarray(REPS1, jnp.int32)
        n2 = jnp.asarray(REPS2, jnp.int32)
        np.asarray(looped(acc0, n1))
        t_lo = t_hi = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(looped(acc0, n1))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(looped(acc0, n2))
            t_hi = min(t_hi, time.perf_counter() - t0)
        return (t_hi - t_lo) / (REPS2 - REPS1)

    call0, a0 = make_call(0, 16, 128)
    ref = np.asarray(run_once(call0, a0))[:, :, :g]
    t0 = timed(call0, a0)
    print(f"v0 current (nb=16)            : {t0*1e3:7.3f} ms")

    for variant, nb, tile, label in [
        (1, 16, 128, "v1 Clenshaw acc-loop"),
        (2, 16, 128, "v2 + Gram acc-loop"),
        (3, 16, 128, "v3 + u/zv acc-loops"),
        (3, 12, 128, "v3 nb=12"),
        (3, 16, 256, "v3 tile=256"),
    ]:
        try:
            call, a = make_call(variant, nb, tile)
            out = np.asarray(run_once(call, a))[:, :, :g]
            err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
            t = timed(call, a)
            print(f"{label:30s}: {t*1e3:7.3f} ms   rel-err {err:.2e}")
        except Exception as e:
            print(f"{label:30s}: FAILED {type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
