"""Compiled on-chip validation of the Brent-Luk Pallas Jacobi eigh.

Measures (VERDICT round-2 item #1):
  1. Mosaic compile wall time of eigh_jacobi at [10^4, 40, 40] f32.
  2. Compiled-f32 quality vs an f64 reference eigh on a degenerate workload
     (24-fold eigenvalue cluster at K=40): eigenvector orthogonality
     ||V^T V - I||_max, reconstruction ||V diag(w) V^T - A||_max,
     eigenvalue error.
  3. Wall time vs XLA jnp.linalg.eigh at [10^4, 40, 40] f32.

Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def make_degenerate(rng, b, k, cluster=24):
    """[b, k, k] f64 SPD with a `cluster`-fold degenerate eigenvalue."""
    evals = np.concatenate(
        [np.full(cluster, 2.5), np.linspace(0.1, 10.0, k - cluster)]
    )
    qs = np.linalg.qr(rng.standard_normal((b, k, k)))[0]
    return np.einsum("bik,k,bjk->bij", qs, evals, qs), evals


def main():
    rng = np.random.default_rng(0)
    b, k = 10_000, 40
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    from tpu_assim.ops.pallas.jacobi import eigh_jacobi

    a64, true_evals = make_degenerate(rng, b, k)
    a32 = jnp.asarray(a64, jnp.float32)
    a32 = jax.device_put(a32, dev)

    # 1. compile time
    t0 = time.perf_counter()
    lowered = jax.jit(eigh_jacobi).lower(a32)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    print(f"compile: {compile_s:.1f} s", flush=True)

    # 2. quality on the degenerate cluster
    w, v = compiled(a32)
    w.block_until_ready()
    w = np.asarray(w, np.float64)
    v = np.asarray(v, np.float64)
    vtv = np.einsum("bki,bkj->bij", v, v)
    orth = np.abs(vtv - np.eye(k)).max()
    recon = np.einsum("bik,bk,bjk->bij", v, w, v)
    recon_err = np.abs(recon - a64).max() / np.abs(a64).max()
    eval_err = np.abs(np.sort(w, -1) - np.sort(true_evals)).max()
    print(f"orthogonality: {orth:.3e}  recon: {recon_err:.3e}  "
          f"evals: {eval_err:.3e}", flush=True)

    # 3. timing vs XLA eigh
    def timeit(fn, x, reps=5):
        r = fn(x)
        jax.tree.map(lambda y: y.block_until_ready(), r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(x)
        jax.tree.map(lambda y: y.block_until_ready(), r)
        return (time.perf_counter() - t0) / reps

    t_jac = timeit(compiled, a32)
    xla_eigh = jax.jit(jnp.linalg.eigh).lower(a32).compile()
    t_xla = timeit(xla_eigh, a32)
    print(json.dumps({
        "compile_s": round(compile_s, 1),
        "orthogonality": float(orth),
        "recon_rel_err": float(recon_err),
        "eval_abs_err": float(eval_err),
        "jacobi_ms": round(t_jac * 1e3, 1),
        "xla_eigh_ms": round(t_xla * 1e3, 1),
        "speedup": round(t_xla / t_jac, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
