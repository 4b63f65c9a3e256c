#!/usr/bin/env python
"""
Profile the monolithic 2-D window kernel (fused2d) on the real chip —
VERDICT r3 #1: the 2-D kernel had none of the round-3 op-issue analysis
applied to it specifically.

Stages measured (bench config 7 shapes: 128x128 grid, 1024 obs, rx=ry=4,
ens=40):
  - end-to-end fused2d at the production settings
  - sel_prec "highest" (6-pass) vs "high" (3-pass) selection matmul —
    bit-compared (the one-hot operand makes 3-pass EXACT, see
    ops/pallas/letkf.py:_sel_precision)
  - degree sweep (Clenshaw share)
  - nb sweep with strict=False (solve-tensor share)
  - tile 128 vs 256

Timing: reps inside ONE jitted fori_loop, two-point slope
(bench._chain_time) — the ~23.4 ms/call axon-tunnel fixed cost cancels.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _chain_time, exact_nb  # noqa: E402
from tpu_assim.ops.pallas.letkf import (  # noqa: E402
    letkf_window_analysis_fused_2d,
    max_in_support_2d,
    required_obs_block_2d,
)


def build_2d(nr=128, nc=128, o=1024, k=40, seed=42):
    rnd = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.arange(nr, dtype="f4"),
                         np.arange(nc, dtype="f4"), indexing="ij")
    grid_xy = np.stack([xx.ravel(), yy.ravel()], 1)
    cells = rnd.choice(nr * nc, size=o, replace=False).astype(np.int32)
    obs_xy = grid_xy[cells]
    state = rnd.normal(size=(k, nr * nc)).astype("f4")
    obs_vals = rnd.normal(size=o).astype("f4")
    ens_obs = state[:, cells]
    mean_o = ens_obs.mean(axis=0)
    perts = ens_obs - mean_o
    innov = obs_vals - mean_o
    mean = state.mean(axis=0)
    sp = state - mean
    return (jnp.asarray(perts), jnp.asarray(innov), jnp.asarray(obs_xy),
            jnp.asarray(grid_xy), jnp.asarray(sp), jnp.asarray(mean)), (
                obs_xy, grid_xy)


def main():
    k = 40
    radius = 4.0
    args, (obs_xy, grid_xy) = build_2d(k=k)
    blk = required_obs_block_2d(obs_xy[:, 1], grid_xy[:, 1], radius)
    nb = exact_nb(max_in_support_2d(obs_xy, grid_xy, radius, radius))
    reg = jnp.asarray((k - 1) / 1.1, jnp.float32)
    g = grid_xy.shape[0]
    print(f"obs_block={blk} nb={nb} g={g}", flush=True)

    def make_step(**kw):
        cfg = dict(obs_block=blk, nb=nb, degree=16)
        cfg.update(kw)

        def step(acc, perts, innov, oxy, gxy, sp, mean):
            out = letkf_window_analysis_fused_2d(
                perts + acc * 1e-9, innov, oxy, gxy, sp, mean, reg,
                radius, radius, k, **cfg)
            return jnp.sum(out) * 1e-12

        return step

    # bitwise check: 3-pass selection vs 6-pass
    def once(**kw):
        cfg = dict(obs_block=blk, nb=nb, degree=16)
        cfg.update(kw)
        return np.asarray(letkf_window_analysis_fused_2d(
            args[0], args[1], args[2], args[3], args[4], args[5], reg,
            radius, radius, k, **cfg))

    hi = once(sel_prec="highest")
    h3 = once(sel_prec="x3")
    print("sel x3 vs highest: bitwise equal =", bool((hi == h3).all()),
          " maxabsdiff =", float(np.abs(hi - h3).max()), flush=True)

    variants = [
        ("base deg16 highest", dict(sel_prec="highest")),
        ("sel x3 (3 bf16 passes)", dict(sel_prec="x3")),
        ("sel default (1 pass, lossy)", dict(sel_prec="default")),
        ("deg12 x3", dict(sel_prec="x3", degree=12)),
        ("deg8 x3", dict(sel_prec="x3", degree=8)),
        ("deg1 x3 (no solve)", dict(sel_prec="x3", degree=1)),
        ("nb16 strict=False x3", dict(sel_prec="x3", nb=16,
                                      strict=False)),
        ("nb8 strict=False deg1 x3", dict(sel_prec="x3", nb=8,
                                          degree=1, strict=False)),
        ("tile256 x3", dict(sel_prec="x3", tile=256)),
    ]
    for tag, kw in variants:
        try:
            t = _chain_time(make_step(**kw), args, reps=100)
            print(f"{tag:32s} {t*1e3:7.3f} ms  {g/t/1e6:7.2f} M gp/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:32s} FAILED: {type(e).__name__}: {e}", flush=True)

    # prologue-only: the XLA block-building code of
    # letkf_window_analysis_fused_2d (y-sort, per-tile band slices, x
    # re-sort, pack concat), no pallas_call — measures how much of the
    # end-to-end time never reaches the kernel
    tile = 128
    o_b = blk

    def prologue(acc, perts, innov, oxy, gxy, sp, mean):
        f32 = jnp.float32
        perts_ = perts + acc * 1e-9
        o = perts_.shape[1]
        kk = perts_.shape[0]
        gp = gxy.shape[0]
        n_tiles = gp // tile
        oy_order = jnp.argsort(oxy[:, 1])
        perts_s = perts_[:, oy_order].astype(f32)
        innov_s = innov[oy_order].astype(f32)
        ox_all = oxy[oy_order, 0].astype(f32)
        oy_all = oxy[oy_order, 1].astype(f32)
        gy = gxy[:, 1].astype(f32)
        ty = gy.reshape(n_tiles, tile)
        lo = ty.min(axis=1) - 2.0 * radius
        hi_ = ty.max(axis=1) + 2.0 * radius
        iy0 = jnp.clip(jnp.searchsorted(oy_all, lo, method="sort"),
                       0, o - 1).astype(jnp.int32)
        iy1 = jnp.searchsorted(oy_all, hi_, side="right",
                               method="sort").astype(jnp.int32)
        idx = iy0[:, None] + jnp.arange(o_b, dtype=jnp.int32)[None, :]
        in_band = (idx < iy1[:, None]) & (idx < o)
        idx_c = jnp.minimum(idx, o - 1)
        big = jnp.asarray(jnp.finfo(f32).max, f32)
        ox_b = jnp.where(in_band, jnp.take(ox_all, idx_c), big)
        oy_b = jnp.where(in_band, jnp.take(oy_all, idx_c), big)
        innov_b = jnp.where(in_band, jnp.take(innov_s, idx_c), 0.0)
        perts_b = jnp.where(
            in_band[:, None, :],
            jnp.take(perts_s, idx_c, axis=1).transpose(1, 0, 2), 0.0)
        ordx = jnp.argsort(ox_b, axis=1)
        ox_b = jnp.take_along_axis(ox_b, ordx, axis=1)
        oy_b = jnp.take_along_axis(oy_b, ordx, axis=1)
        innov_b = jnp.take_along_axis(innov_b, ordx, axis=1)
        perts_b = jnp.take_along_axis(perts_b, ordx[:, None, :], axis=2)
        rows_pad = -(-(kk + 3) // 8) * 8
        pack = jnp.concatenate(
            [perts_b, innov_b[:, None, :], ox_b[:, None, :],
             oy_b[:, None, :],
             jnp.zeros((n_tiles, rows_pad - kk - 3, o_b), f32)], axis=1)
        return jnp.sum(pack) * 1e-12

    t = _chain_time(prologue, args, reps=100)
    print(f"{'prologue only (XLA)':32s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
