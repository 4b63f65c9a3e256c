"""On-chip validation of eigh-through-one-sided-SVD vs the two-sided
Jacobi eigh kernel (VERDICT round-4 item #4: take the eigh worst case at
[10^4, 40, 40] f32 random SPD to <= 120 ms).

Compares eigh_svd_jacobi / eigh_jacobi / XLA jnp.linalg.eigh on
  (a) random SPD Grams (the benchmark's worst case), and
  (b) the 24-fold degenerate-cluster workload of validate_jacobi.py,
on quality (orthogonality, reconstruction, eigenvalue error vs f64) and
wall time. Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def quality(w, v, a64, true_evals=None):
    k = a64.shape[-1]
    w = np.asarray(w, np.float64)
    v = np.asarray(v, np.float64)
    orth = np.abs(
        np.einsum("bki,bkj->bij", v, v) - np.eye(k)
    ).max()
    rec = np.einsum("bik,bk,bjk->bij", v, w, v)
    rec_err = np.abs(rec - a64).max() / np.abs(a64).max()
    if true_evals is None:
        true_evals = np.linalg.eigvalsh(a64)
    ev_err = np.abs(np.sort(w, -1) - np.sort(true_evals, -1)).max()
    return orth, rec_err, ev_err


def timeit(fn, x, reps=5):
    r = fn(x)
    jax.tree.map(lambda y: y.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(x)
    jax.tree.map(lambda y: y.block_until_ready(), r)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    b, k = 10_000, 40
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    from tpu_assim.ops.pallas.jacobi import eigh_jacobi
    from tpu_assim.ops.pallas.svd import eigh_svd_jacobi

    # (a) random SPD — the worst case
    z = rng.standard_normal((b, k, k))
    spd64 = np.einsum("bij,bkj->bik", z, z) + 0.5 * np.eye(k)
    spd32 = jnp.asarray(spd64, jnp.float32)

    # (b) degenerate 24-fold cluster
    evals = np.concatenate(
        [np.full(24, 2.5), np.linspace(0.1, 10.0, k - 24)]
    )
    qs = np.linalg.qr(rng.standard_normal((b, k, k)))[0]
    deg64 = np.einsum("bik,k,bjk->bij", qs, evals, qs)
    deg32 = jnp.asarray(deg64, jnp.float32)

    f_svd = jax.jit(eigh_svd_jacobi).lower(spd32).compile()
    f_two = jax.jit(eigh_jacobi).lower(spd32).compile()

    out = {}
    for name, a32, a64, te in (
        ("spd", spd32, spd64, None),
        ("degenerate", deg32, deg64, np.broadcast_to(evals, (b, k))),
    ):
        w1, v1 = f_svd(a32)
        orth, rec, ev = quality(w1, v1, a64, te)
        out[f"{name}_onesided"] = {
            "orth": float(orth), "rec_rel": float(rec), "ev_abs": float(ev)}
        w2, v2 = f_two(a32)
        orth, rec, ev = quality(w2, v2, a64, te)
        out[f"{name}_twosided"] = {
            "orth": float(orth), "rec_rel": float(rec), "ev_abs": float(ev)}
        print(name, out[f"{name}_onesided"], out[f"{name}_twosided"],
              flush=True)

    t_one = timeit(f_svd, spd32)
    t_two = timeit(f_two, spd32)
    xla = jax.jit(jnp.linalg.eigh).lower(spd32).compile()
    t_xla = timeit(xla, spd32, reps=2)
    out.update({
        "onesided_ms": round(t_one * 1e3, 1),
        "twosided_ms": round(t_two * 1e3, 1),
        "xla_eigh_ms": round(t_xla * 1e3, 1),
        "speedup_vs_xla": round(t_xla / t_one, 2),
    })
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
