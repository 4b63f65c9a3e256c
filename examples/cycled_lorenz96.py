#!/usr/bin/env python
"""
Cycled LETKF twin experiment on Lorenz-96 — the composition the reference
builds across its example scripts (SURVEY §3.5;
/root/reference/examples/benchmark_letkf.py): spin up a truth run, draw
noisy observations every cycle, forecast the ensemble with RK4, assimilate
with the localized ETKF, and report ensemble-mean RMSE against the truth.

Everything inside the cycle is one jitted program (forecast scan + fused
analysis); the host only generates observations and logs.

Run: python examples/cycled_lorenz96.py [--cycles 100] [--ens 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax.numpy as jnp

from tpu_assim.analysis import make_cycle_step
from tpu_assim.models import Lorenz96, RK4Integrator, integrate_trajectory
from tpu_assim.ops.localization import GaspariCohn
from tpu_assim.utils.profiling import phase, report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cycles", type=int, default=100)
    p.add_argument("--ens", type=int, default=20)
    p.add_argument("--grid", type=int, default=40)
    p.add_argument("--obs-every", type=int, default=2)
    p.add_argument("--obs-var", type=float, default=0.5)
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--inf", type=float, default=1.1)
    p.add_argument("--dt", type=float, default=0.05)
    p.add_argument("--steps-per-cycle", type=int, default=4)
    p.add_argument("--fast", action="store_true")
    args = p.parse_args()

    rng = np.random.RandomState(42)
    model = Lorenz96(forcing=8.0)
    integ = RK4Integrator(model, dt=args.dt)

    truth = jnp.asarray(rng.normal(size=args.grid) + 8.0)
    truth = integrate_trajectory(integ, truth, 500)[-1]
    ens = truth[None, :] + jnp.asarray(
        rng.normal(size=(args.ens, args.grid))
    )

    obs_idx = jnp.asarray(
        np.arange(0, args.grid, args.obs_every, dtype=np.int32)
    )
    n_obs = len(obs_idx)
    obs_var = jnp.full((n_obs,), args.obs_var)
    grid_coords = jnp.asarray(np.arange(args.grid, dtype=float))[:, None]
    obs_coords = grid_coords[obs_idx]

    def dist_periodic(gc, oi):
        d = jnp.abs(oi[:, 1] - gc[1])
        return jnp.minimum(d, args.grid - d)[None, :]

    def dist_abs(gc, oi):
        return jnp.abs(oi[:, 1] - gc[1])[None, :]

    # --fast uses the monolithic fused kernel, which evaluates a plain
    # |x - y| taper on the sorted coordinate (no ring wrap at the domain
    # edge — a slightly different localization near the boundary)
    loc = GaspariCohn((args.radius,),
                      dist_abs if args.fast else dist_periodic)
    opts = dict(method="fused1d", max_obs=16) if args.fast else {}
    step = make_cycle_step(
        integ, args.steps_per_cycle, loc, inf_factor=args.inf, **opts
    )

    rmses = []
    t0 = time.time()
    for cycle in range(args.cycles):
        with phase("truth+obs"):
            truth = integrate_trajectory(integ, truth,
                                         args.steps_per_cycle)[-1]
            obs = truth[obs_idx] + jnp.asarray(
                rng.normal(size=n_obs) * np.sqrt(args.obs_var)
            )
        with phase("forecast+analysis"):
            ens = step(ens, obs, obs_var, obs_idx, grid_coords, obs_coords)
        rmse = float(jnp.sqrt(jnp.mean((jnp.mean(ens, 0) - truth) ** 2)))
        rmses.append(rmse)
        if (cycle + 1) % 10 == 0:
            print(f"cycle {cycle + 1:4d}  rmse {rmse:.4f}")

    half = len(rmses) // 2
    print(f"\nmean RMSE (2nd half): {np.mean(rmses[half:]):.4f} "
          f"(obs sigma {np.sqrt(args.obs_var):.3f})")
    print(f"wall: {time.time() - t0:.1f}s for {args.cycles} cycles")
    print()
    print(report())


if __name__ == "__main__":
    main()
