#!/usr/bin/env python
"""
Measured accuracy budget of the f32 fused paths vs the float64 oracle
(VERDICT r3 #7 / Missing #3): every BASELINE-config fused analysis compared
against a numpy float64 re-enactment of the exact per-column eigh solve
(the reference's computation model, pytassim/interface/letkf.py:127-143 +
core/etkf.py:57-77, which runs in f64 by default — interface/base.py:73).

Prints one line per config: max relative error over a grid-column sample
(the oracle loop is O(g·o), so large grids are subsampled column-wise —
the fused analysis itself always runs FULL, so blocking/selection effects
are fully exercised; only the comparison is sampled).

The committed bounds live in tests_tpu/test_accuracy_budget.py (chip) and
docs/solvers.md (table). Run on the TPU; CPU works too (interpret mode).
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from bench import (  # noqa: E402
    build_workload,
    exact_nb,
    gc_weights_numpy,
)


def oracle_columns(state, perts, innov, weights_fn, cols, inf_factor=1.1):
    """Exact f64 per-column eigh analysis at the given columns.

    ``weights_fn(g) -> [o] taper weights`` defines the localization;
    perts/innov are the R^{-1/2}-normalized obs-space arrays (f64).
    """
    k = state.shape[0]
    reg = (k - 1) / inf_factor
    mean = state.mean(axis=0)
    sp = state - mean
    out = np.empty((k, len(cols)))
    for j, g in enumerate(cols):
        w = weights_fn(g)
        use = w > 1e-5
        sw = np.sqrt(w[use])
        z = perts[:, use] * sw
        y = innov[use] * sw
        gram = z @ z.T
        evals, evects = np.linalg.eigh(gram)
        evals = np.clip(evals, 0, None) + reg
        einv = 1.0 / evals
        cov = (evects * einv) @ evects.T
        w_mean = cov @ (z @ y)
        w_perts = (evects * np.sqrt((k - 1) * einv)) @ evects.T
        out[:, j] = mean[g] + sp[:, g] @ (w_mean[:, None] + w_perts)
    return out


def normalized(state, obs_vals, obs_var, obs_idx):
    ens_obs = state[:, obs_idx]
    mean_o = ens_obs.mean(axis=0)
    rcinv = 1.0 / np.sqrt(obs_var)
    return (ens_obs - mean_o) * rcinv, (obs_vals - mean_o) * rcinv


def rel_err(fused, oracle, cols):
    f = np.asarray(fused, dtype=np.float64)[:, cols]
    scale = np.abs(oracle).max()
    return float(np.abs(f - oracle).max() / scale)


def main(n_sample=512, seed=123):
    import jax

    from tpu_assim.analysis import make_letkf_analysis
    from tpu_assim.ops.localization import GaspariCohn
    from tpu_assim.ops.pallas.letkf import (
        max_in_support_1d,
        max_in_support_2d,
        required_obs_block_2d,
    )

    rows = []
    rnd = np.random.RandomState(seed)

    def dist_fn(gc, oi):
        return jnp.abs(oi[:, 1] - gc[1])[None, :]

    # ---- 1-D fused1d at the headline config (ens=40, g=1e4, o=1e3) -----
    w = build_workload(40, 10000, 1000, dtype="float64")
    state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = w
    nb = exact_nb(max_in_support_1d(obs_coords[:, 0], grid_coords[:, 0],
                                    20.0))
    perts, innov = normalized(state, obs_vals, obs_var, obs_idx)
    cols = np.sort(rnd.choice(10000, size=n_sample, replace=False))
    oracle = oracle_columns(
        state, perts, innov,
        lambda g: gc_weights_numpy(
            np.abs(grid_coords[g, 0] - obs_coords[:, 0]), 20.0),
        cols,
    )
    args32 = tuple(jnp.asarray(np.asarray(a, dtype="f4" if np.asarray(
        a).dtype.kind == "f" else None)) for a in w)
    for degree in (12, 16):
        fused = make_letkf_analysis(
            GaspariCohn((20.0,), dist_fn), 1.1, method="fused1d",
            max_obs=nb, cheb_degree=degree)(*args32)
        rows.append({"config": f"fused1d deg{degree} (headline)",
                     "max_rel_err": rel_err(fused, oracle, cols)})

    cheb = make_letkf_analysis(
        GaspariCohn((20.0,), dist_fn), 1.1, method="cheb", max_obs=nb,
        cheb_degree=12, selection="window")(*args32)
    rows.append({"config": "cheb deg12 window (headline)",
                 "max_rel_err": rel_err(cheb, oracle, cols)})

    # ---- 2-D fused2d at the 128x128 config -----------------------------
    nr = nc = 128
    g7, o7 = nr * nc, 1024
    rnd7 = np.random.RandomState(42)
    yy, xx = np.meshgrid(np.arange(nr, dtype="f8"),
                         np.arange(nc, dtype="f8"), indexing="ij")
    grid_xy = np.stack([xx.ravel(), yy.ravel()], 1)
    cells = rnd7.choice(g7, size=o7, replace=False).astype(np.int32)
    obs_xy = grid_xy[cells]
    state7 = rnd7.normal(size=(40, g7))
    vals7 = rnd7.normal(size=o7)
    var7 = np.ones(o7)
    perts7, innov7 = normalized(state7, vals7, var7, cells)
    cols7 = np.sort(rnd.choice(g7, size=n_sample, replace=False))
    oracle7 = oracle_columns(
        state7, perts7, innov7,
        lambda g: (gc_weights_numpy(
            np.abs(grid_xy[g, 0] - obs_xy[:, 0]), 4.0)
            * gc_weights_numpy(
                np.abs(grid_xy[g, 1] - obs_xy[:, 1]), 4.0)),
        cols7,
    )

    def dist2(gc, oi):
        return jnp.stack([jnp.abs(oi[:, 1] - gc[1]),
                          jnp.abs(oi[:, 2] - gc[2])], 0)

    blk7 = required_obs_block_2d(obs_xy[:, 1], grid_xy[:, 1], 4.0)
    nb7 = exact_nb(max_in_support_2d(obs_xy, grid_xy, 4.0, 4.0))
    a7 = (jnp.asarray(state7, jnp.float32), jnp.asarray(vals7, jnp.float32),
          jnp.asarray(var7, jnp.float32), jnp.asarray(cells),
          jnp.asarray(grid_xy, jnp.float32),
          jnp.asarray(obs_xy, jnp.float32))
    for degree in (12, 16):
        fused2 = make_letkf_analysis(
            GaspariCohn((4.0, 4.0), dist2), 1.1, method="fused2d",
            max_obs=nb7, cheb_degree=degree, obs_block=blk7)(*a7)
        rows.append({"config": f"fused2d deg{degree} (128x128)",
                     "max_rel_err": rel_err(fused2, oracle7, cols7)})

    for r in rows:
        print(json.dumps(r), flush=True)
    return rows


if __name__ == "__main__":
    main()
