"""Tile-size scan for the Pallas Jacobi at sweeps=7, [10^4, 40, 40] f32."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_assim.ops.pallas.jacobi import eigh_jacobi


def main():
    rng = np.random.default_rng(1)
    b, k = 10_000, 40
    evals = np.exp(rng.uniform(np.log(1e-3), np.log(10.0), (b, k)))
    qs = np.linalg.qr(rng.standard_normal((b, k, k)))[0]
    a64 = np.einsum("bik,bk,bjk->bij", qs, evals, qs)
    a32 = jnp.asarray(a64, jnp.float32)
    for tile in (128, 256, 512):
        fn = jax.jit(lambda a, t=tile: eigh_jacobi(a, sweeps=7, tile=t))
        try:
            w, v = fn(a32)
            w.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"tile": tile, "error": str(e)[:200]}),
                  flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(3):
            w, v = fn(a32)
        w.block_until_ready()
        v.block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        w64 = np.asarray(w, np.float64)
        v64 = np.asarray(v, np.float64)
        orth = np.abs(np.einsum("bki,bkj->bij", v64, v64) - np.eye(k)).max()
        print(json.dumps({"tile": tile, "ms": round(dt * 1e3, 1),
                          "orth": float(orth)}), flush=True)


if __name__ == "__main__":
    main()
