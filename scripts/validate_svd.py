"""Compiled on-chip validation of the one-sided Hestenes Pallas SVD.

Measures (VERDICT round-4 item #1 — the last SURVEY §2.10 native-kernel
obligation):
  1. Mosaic compile wall time of svd_jacobi at [10^4, 40, 40] f32.
  2. Compiled-f32 quality vs an f64 reference svd on random square
     matrices AND on an ill-conditioned batch (sigma spanning 1e4):
     recomposition ||U diag(s) V^T - A||_max / ||A||_max, factor
     orthogonality, singular value error.
  3. Wall time vs XLA jnp.linalg.svd at [10^4, 40, 40] f32.

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


def main():
    rng = np.random.default_rng(0)
    b, k = 10_000, 40
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    from tpu_assim.ops.pallas.svd import svd_jacobi

    a64 = rng.standard_normal((b, k, k))
    # ill-conditioned second half: sigma spanning 1e4
    qs = np.linalg.qr(rng.standard_normal((b // 2, k, k)))[0]
    qs2 = np.linalg.qr(rng.standard_normal((b // 2, k, k)))[0]
    sv = np.geomspace(1.0, 1e-4, k)
    a64[b // 2:] = np.einsum("bik,k,bjk->bij", qs, sv, qs2)
    a32 = jax.device_put(jnp.asarray(a64, jnp.float32), dev)

    # 1. compile time
    t0 = time.perf_counter()
    compiled = jax.jit(svd_jacobi).lower(a32).compile()
    compile_s = time.perf_counter() - t0
    print(f"compile: {compile_s:.1f} s", flush=True)

    # 2. quality
    u, s, v = compiled(a32)
    s.block_until_ready()
    u = np.asarray(u, np.float64)
    s = np.asarray(s, np.float64)
    v = np.asarray(v, np.float64)
    ref_s = np.linalg.svd(a64, compute_uv=False)
    s_err = np.abs(s - ref_s).max() / ref_s.max()
    rec = np.einsum("bik,bk,bjk->bij", u, s, v)
    rec_err = np.abs(rec - a64).max() / np.abs(a64).max()
    orth_u = np.abs(
        np.einsum("bki,bkj->bij", u, u) - np.eye(k)
    ).max()
    orth_v = np.abs(
        np.einsum("bki,bkj->bij", v, v) - np.eye(k)
    ).max()
    print(f"s_rel_err: {s_err:.3e}  recon: {rec_err:.3e}  "
          f"orth(U): {orth_u:.3e}  orth(V): {orth_v:.3e}", flush=True)

    # 3. timing vs XLA svd
    def timeit(fn, x, reps=5):
        r = fn(x)
        jax.tree.map(lambda y: y.block_until_ready(), r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(x)
        jax.tree.map(lambda y: y.block_until_ready(), r)
        return (time.perf_counter() - t0) / reps

    t_jac = timeit(compiled, a32)

    def xla_svd(x):
        return jnp.linalg.svd(x, full_matrices=False)

    xla = jax.jit(xla_svd).lower(a32).compile()
    t_xla = timeit(xla, a32, reps=2)
    print(json.dumps({
        "compile_s": round(compile_s, 1),
        "s_rel_err": float(s_err),
        "recon_rel_err": float(rec_err),
        "orth_u": float(orth_u),
        "orth_v": float(orth_v),
        "jacobi_svd_ms": round(t_jac * 1e3, 1),
        "xla_svd_ms": round(t_xla * 1e3, 1),
        "speedup": round(t_xla / t_jac, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
