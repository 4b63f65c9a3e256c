"""Sweep-count sensitivity for the compiled Pallas Jacobi at K=40.

Degenerate-cluster + random-PSD + rank-deficient-localized-Gram workloads:
find the smallest sweep count keeping orthogonality <= 1e-5 and
reconstruction at the f32 roundoff floor.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_assim.ops.pallas.jacobi import eigh_jacobi


def workloads(rng, b, k):
    out = {}
    # 24-fold degenerate cluster
    evals = np.concatenate([np.full(24, 2.5), np.linspace(0.1, 10.0, k - 24)])
    qs = np.linalg.qr(rng.standard_normal((b, k, k)))[0]
    out["degen24"] = np.einsum("bik,k,bjk->bij", qs, evals, qs)
    # random PSD, condition ~1e4
    evals = np.exp(rng.uniform(np.log(1e-3), np.log(10.0), (b, k)))
    out["randpsd"] = np.einsum("bik,bk,bjk->bij", qs, evals, qs)
    # rank-deficient localized Gram: Z^T Z with Z [b, 10, k] (rank 10)
    z = rng.standard_normal((b, 10, k))
    out["rankdef"] = np.einsum("bok,bol->bkl", z, z)
    return out


def main():
    rng = np.random.default_rng(1)
    b, k = 10_000, 40
    ws = workloads(rng, b, k)
    results = {}
    for sweeps in (5, 6, 7, 8):
        fn = jax.jit(lambda a, s=sweeps: eigh_jacobi(a, sweeps=s))
        row = {}
        for name, a64 in ws.items():
            a32 = jnp.asarray(a64, jnp.float32)
            w, v = fn(a32)
            w.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                w, v = fn(a32)
            w.block_until_ready()
            dt = (time.perf_counter() - t0) / 3
            w = np.asarray(w, np.float64)
            v = np.asarray(v, np.float64)
            orth = np.abs(
                np.einsum("bki,bkj->bij", v, v) - np.eye(k)
            ).max()
            recon = np.einsum("bik,bk,bjk->bij", v, w, v)
            rerr = np.abs(recon - a64).max() / np.abs(a64).max()
            row[name] = {"orth": float(orth), "recon": float(rerr),
                         "ms": round(dt * 1e3, 1)}
        results[sweeps] = row
        print(json.dumps({"sweeps": sweeps, **row}), flush=True)


if __name__ == "__main__":
    main()
