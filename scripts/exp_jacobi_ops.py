#!/usr/bin/env python
"""A/B per-round op structure of the Brent-Luk Jacobi kernel on the chip.

v0: current (roll+parity-select pairswap, 3-roll re-seating, V columns)
v1: untiled-axis pairswap via reshape[(K/2,2)]-swap, re-seating via
    half-tensor rolls on the reshaped view
v2: v1 + V stored transposed (rows = seats -> all V ops on the untiled
    axis), one [K,K,T] transpose at the end
Each variant is checked against jnp.linalg.eigh reconstruction before
timing (f32; reconstruction ~1e-4 floor).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

f32 = jnp.float32
B, K, TILE = 10000, 40, 128
SWEEPS = 7
REPS1, REPS2 = 2, 6


def _mask_iota(shape_len, axis, k):
    shape = [1] * shape_len
    shape[axis] = k
    return jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)


def _pairswap_roll(x, axis, k):
    p = _mask_iota(x.ndim, axis, k)
    nxt = jnp.roll(x, -1, axis=axis)
    prv = jnp.roll(x, 1, axis=axis)
    return jnp.where(p % 2 == 0, nxt, prv)


def _pairswap_reshape0(x, k):
    """pairswap along axis 0 via (K/2, 2) split + swap of the size-2 axis
    (untiled dims only — no relayout; Mosaic has no rev, so the swap is a
    stack of the two untiled slices)."""
    s = x.shape
    y = x.reshape((k // 2, 2) + s[1:])
    y = jnp.stack([y[:, 1], y[:, 0]], axis=1)
    return y.reshape(s)


def _perm_round_roll(x, axis, k):
    if k == 2:
        return x
    p = _mask_iota(x.ndim, axis, k)
    r2p = jnp.roll(x, 2, axis=axis)
    r2m = jnp.roll(x, -2, axis=axis)
    r1p = jnp.roll(x, 1, axis=axis)
    out = jnp.where(p % 2 == 0, r2p, r2m)
    out = jnp.where((p == 2) | (p == k - 1), r1p, out)
    return jnp.where(p == 0, x, out)


def _perm_round_reshape0(x, k):
    """Tournament re-seating along axis 0 via the (K/2, 2) seat split:
    evens roll +1 in the pair index, odds roll -1; patch seats 0, 2, K-1."""
    if k == 2:
        return x
    s = x.shape
    y = x.reshape((k // 2, 2) + s[1:])
    ev = jnp.roll(y[:, 0], 1, axis=0)     # new even seats 2i <- old 2i-2
    od = jnp.roll(y[:, 1], -1, axis=0)    # new odd seats 2i+1 <- old 2i+3
    i = _mask_iota(ev.ndim, 0, k // 2)
    # seat 0 (i=0 even): fixed -> old[0] = y[0, 0]
    ev = jnp.where(i == 0, y[0, 0][None], ev)
    # seat 2 (i=1 even): <- old[1] = y[0, 1]
    ev = jnp.where(i == 1, y[0, 1][None], ev)
    # seat K-1 (i=K/2-1 odd): <- old[K-2] = y[K/2-1, 0]
    od = jnp.where(i == k // 2 - 1, y[k // 2 - 1, 0][None], od)
    return jnp.stack([ev, od], axis=1).reshape(s)


def make_kernel(k, sweeps, variant):
    def kernel(a_ref, evals_ref, evecs_ref):
        dtype = a_ref.dtype
        a = a_ref[:][0]
        t_cols = a.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        eye2 = (row == col).astype(dtype)
        anti = ((row // 2 == col // 2) & (row != col)).astype(dtype)
        v = eye2[:, :, None] * jnp.ones((1, 1, t_cols), dtype)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (k, t_cols), 0)
        even = i1 % 2 == 0
        eps = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

        if variant == 0:
            psw0 = lambda x: _pairswap_roll(x, 0, k)
            prm0 = lambda x: _perm_round_roll(x, 0, k)
        else:
            psw0 = lambda x: _pairswap_reshape0(x, k)
            prm0 = lambda x: _perm_round_reshape0(x, k)

        def round_body(_, av):
            a, v = av
            d = jnp.sum(a * eye2[:, :, None], axis=1)
            o = jnp.sum(a * anti[:, :, None], axis=1)
            o = 0.5 * (o + psw0(o))
            dq = psw0(d)
            o_safe = jnp.where(jnp.abs(o) > eps, o, 1.0)
            tau = (dq - d) / (2.0 * o_safe)
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(tau == 0.0, jnp.where(even, 1.0, -1.0), t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            tol = jnp.asarray(8 * k * jnp.finfo(dtype).eps, dtype) * (
                jnp.abs(d) + jnp.abs(dq)
            ) + eps
            live = jnp.abs(o) > tol
            c = jnp.where(live, c, 1.0)
            s = jnp.where(live, s, 0.0)
            a = c[:, None, :] * a - s[:, None, :] * psw0(a)
            a = c[None, :, :] * a - s[None, :, :] * _pairswap_roll(a, 1, k)
            a = prm0(a)
            a = _perm_round_roll(a, 1, k)
            if variant >= 2:
                # v stored transposed: rows are column-seats -> all ops
                # on the untiled axis
                v = c[:, None, :] * v - s[:, None, :] * psw0(v)
                v = prm0(v)
            else:
                v = c[None, :, :] * v - s[None, :, :] * _pairswap_roll(
                    v, 1, k)
                v = _perm_round_roll(v, 1, k)
            return a, v

        a, v = jax.lax.fori_loop(0, sweeps * (k - 1), round_body, (a, v))
        evals_ref[:] = jnp.sum(a * eye2[:, :, None], axis=1)[None]
        if variant >= 2:
            evecs_ref[:] = jnp.swapaxes(v, 0, 1)[None]
        else:
            evecs_ref[:] = v[None]

    return kernel


def run(variant, a2):
    k = K
    n_tiles = -(-B // TILE)
    kernel = make_kernel(k, SWEEPS, variant)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, k, k, TILE), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, k, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, k, TILE), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, k, n_tiles * TILE), f32),
            jax.ShapeDtypeStruct((1, k, k, n_tiles * TILE), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a2[None])


def main():
    rng = np.random.RandomState(7)
    z = rng.randn(B, K, K).astype("f4")
    mats = (z @ z.transpose(0, 2, 1)) / K
    a2 = jnp.asarray(np.moveaxis(mats, 0, -1))          # [K, K, B]
    pad = (-B) % TILE
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, pad)))

    for variant in (0, 1, 2):
        t0 = time.perf_counter()
        evals, evecs = run(variant, a2)
        np.asarray(evals)
        compile_s = time.perf_counter() - t0
        ev = np.moveaxis(np.asarray(evals)[0, :, :B], -1, 0)
        V = np.moveaxis(np.asarray(evecs)[0, :, :, :B], -1, 0)
        rec = np.einsum("bij,bj,bkj->bik", V, ev, V)
        rel = np.max(np.abs(rec - mats)) / np.max(np.abs(mats))
        orth = np.max(np.abs(
            np.einsum("bij,bik->bjk", V, V) - np.eye(K)[None]))

        @jax.jit
        def looped(acc, n, aa):
            def body(_, x):
                e, _v = run(variant, aa + x * 1e-12)
                return jnp.sum(e) * 1e-12
            return jax.lax.fori_loop(0, n, body, acc)

        acc0 = jnp.asarray(0.0, f32)
        np.asarray(looped(acc0, jnp.asarray(REPS1), a2))
        ts = {}
        for r in (REPS1, REPS2):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(looped(acc0, jnp.asarray(r), a2))
                best = min(best, time.perf_counter() - t0)
            ts[r] = best
        per = (ts[REPS2] - ts[REPS1]) / (REPS2 - REPS1)
        print(f"v{variant}: {per*1e3:7.1f} ms/call  compile {compile_s:5.1f}s"
              f"  rec-rel {rel:.2e}  orth {orth:.2e}")


if __name__ == "__main__":
    main()
