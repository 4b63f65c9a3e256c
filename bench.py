#!/usr/bin/env python
"""
Benchmark driver: the reference's LETKF workload
(/root/reference/examples/benchmark_letkf.py:49-77) on TPU.

Workload (identical shapes/parameters to the reference defaults): 40-member
ensemble, 10 000 grid points, 1 000 point observations at
``linspace(0, len_grid)`` locations, obs variance 1, Gaspari-Cohn radius 20,
inflation 1.1, ``abs(x - y)`` distance. Metric: analysis grid-points/s.

Baseline: the reference publishes no numbers (BASELINE.md), so ``vs_baseline``
is measured live against a faithful numpy re-enactment of pytassim's
execution model — a per-gridpoint Python loop with ragged masked obs subsets
and a K x K eigendecomposition per column (what
pytassim/interface/letkf.py:127-143 + core/etkf.py:57-77 do inside
np.vectorize), run on this host's CPU.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def build_workload(ens_size=40, len_grid=10000, nr_obs=1000, dtype="float32"):
    rnd = np.random.RandomState(42)
    state = rnd.normal(size=(ens_size, len_grid)).astype(dtype)
    obs_locs = np.linspace(0, len_grid, num=nr_obs, endpoint=False)
    obs_idx = np.rint(obs_locs).astype(np.int32) % len_grid
    obs_vals = rnd.normal(size=(nr_obs,)).astype(dtype)
    obs_var = np.ones(nr_obs, dtype=dtype)
    grid_coords = np.arange(len_grid, dtype=dtype)[:, None]
    obs_coords = obs_locs.astype(dtype)[:, None]
    return state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords


def gc_weights_numpy(dists, radius):
    """Gaspari-Cohn taper (pytassim/localization/gaspari_cohn.py:77-95)."""
    z = dists / radius
    w = np.zeros_like(z)
    outer = (z >= 1) & (z < 2)
    inner = z < 1
    zo = z[outer]
    w[outer] = (
        zo**5 / 12 - 0.5 * zo**4 + 0.625 * zo**3 + 5 / 3 * zo**2
        - 5 * zo + 4 - 2 / (3 * zo)
    )
    zi = z[inner]
    w[inner] = -0.25 * zi**5 + 0.5 * zi**4 + 0.625 * zi**3 - 5 / 3 * zi**2 + 1
    return w


def numpy_reference_letkf(state, obs_vals, obs_var, obs_idx, grid_coords,
                          obs_coords, radius=20.0, inf_factor=1.1,
                          max_points=None):
    """pytassim-style per-gridpoint loop (the reference execution model)."""
    ens_size, len_grid = state.shape
    rcinv = 1.0 / np.sqrt(obs_var)
    ens_obs = state[:, obs_idx]
    mean_obs = ens_obs.mean(axis=0)
    perts = (ens_obs - mean_obs) * rcinv
    innov = (obs_vals - mean_obs) * rcinv
    n_points = len_grid if max_points is None else min(max_points, len_grid)
    analysis = np.empty((ens_size, n_points), dtype=np.float64)
    state_mean = state.mean(axis=0)
    state_perts = state - state_mean
    reg = (ens_size - 1) / inf_factor
    for g in range(n_points):
        d = np.abs(grid_coords[g, 0] - obs_coords[:, 0])
        w = gc_weights_numpy(d, radius)
        use = w > 1e-5
        sw = np.sqrt(w[use])
        z = perts[:, use] * sw
        y = innov[use] * sw
        gram = z @ z.T
        evals, evects = np.linalg.eigh(gram)
        evals = np.clip(evals, 0, None) + reg
        einv = 1 / evals
        cov = (evects * einv) @ evects.T
        w_mean = cov @ (z @ y)
        w_perts = (evects * np.sqrt((ens_size - 1) * einv)) @ evects.T
        wmat = w_mean[:, None] + w_perts
        analysis[:, g] = state_mean[g] + state_perts[:, g] @ wmat
    return analysis, n_points


def main():
    import jax
    import jax.numpy as jnp

    from tpu_assim.analysis import make_letkf_analysis
    from tpu_assim.ops.localization import GaspariCohn

    ens_size, len_grid, nr_obs, radius, inf = 40, 10000, 1000, 20.0, 1.1
    workload = build_workload(ens_size, len_grid, nr_obs)
    state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords = workload

    def dist_fn(grid_coord, obs_info):
        # column 0 is the time column; distances on the spatial column
        return jnp.abs(obs_info[:, 1] - grid_coord[1])[None, :]

    loc = GaspariCohn((radius,), dist_fn)
    # Fast path: fixed-size obs neighborhoods (radius 20 -> cutoff 2r=40,
    # obs spacing 10 -> at most 9 nonzero-weight obs per column, so
    # max_obs=16 is exact, not an approximation), chosen by sorted-coordinate
    # window (exact for this 1-D layout, O(g*nb) instead of O(g*o)+top_k),
    # solved+applied by the fused lane-major Chebyshev/Clenshaw Pallas kernel
    # (ops/pallas/letkf.py:letkf_nbh_analysis_cheb; ~3e-6 relative to the
    # f64 eigh path on this workload).
    analyse = make_letkf_analysis(
        loc, inf_factor=inf, chunksize=None,
        method="cheb", max_obs=16, selection="window",
    )
    args = tuple(
        jnp.asarray(a)
        for a in (state, obs_vals, obs_var, obs_idx, grid_coords, obs_coords)
    )
    import numpy as _np

    # Steady-state throughput: each rep feeds a data-dependent perturbation
    # of the state back into the next analysis (so XLA cannot hoist or fuse
    # across reps), all reps stay on device, and one scalar D2H closes the
    # chain — this measures the analysis itself, not host dispatch or the
    # axon-tunnel copy latency. Best of several trials.
    @jax.jit
    def chained(acc):
        out = analyse(args[0] + acc * 1e-9, *args[1:])
        return jnp.sum(out) * 1e-12

    _np.asarray(chained(jnp.asarray(0.0, args[0].dtype)))  # warmup/compile
    reps, trials = 20, 4
    times = []
    for _trial in range(trials):
        acc = jnp.asarray(0.0, args[0].dtype)
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = chained(acc)
        _np.asarray(acc)
        times.append((time.perf_counter() - t0) / reps)
    tpu_time = min(times)
    tpu_gps = len_grid / tpu_time

    # numpy pytassim-style baseline on a grid subsample, extrapolated
    baseline_points = 2000
    t0 = time.perf_counter()
    _, n_done = numpy_reference_letkf(
        *workload, radius=radius, inf_factor=inf, max_points=baseline_points
    )
    base_time_per_point = (time.perf_counter() - t0) / n_done
    base_gps = 1.0 / base_time_per_point

    print(
        json.dumps(
            {
                "metric": "letkf_analysis_grid_points_per_s",
                "value": round(tpu_gps, 1),
                "unit": "grid-points/s (ens=40, grid=10000, obs=1000, GC r=20)",
                "vs_baseline": round(tpu_gps / base_gps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
