"""
Fused model forecast as ONE Pallas kernel.

The XLA scan over RK4 stages runs every stage as separate HBM-resident
ops: 4 steps x 4 stages x ~7 elementwise passes over the [k, g] ensemble
cost 0.085 ms on the cycled-DA benchmark (ens=40, g=10^4) — more than a
third of the whole cycle once the analysis runs at 0.15 ms. For models
whose time derivative is pure elementwise + static-shift work (Lorenz-96:
rolls and multiplies, models/lorenz96.py), the entire multi-step RK4
forecast fits in VMEM: ONE kernel reads the ensemble once, iterates all
steps on-chip, and writes the forecast once.

Semantics match :class:`tpu_assim.models.RK4Integrator` with the classic
[1, 2, 2, 1]/6 weights (reference: pytassim/model/integration/rk4.py:39-114)
up to floating-point reassociation of the stage combination.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_rk4_steps", "supports_fused_rk4"]

# whole-ensemble VMEM budget: state + 4 stage slopes + temporaries
_MAX_STATE_BYTES = 8 * 1024 * 1024


def supports_fused_rk4(integrator, state_shape, dtype_bytes=4) -> bool:
    """True when ``integrator`` is a stock RK4 over a Mosaic-lowerable
    model and the whole ensemble fits the kernel's VMEM budget."""
    from tpu_assim.models.integration import RK4Integrator
    from tpu_assim.models.lorenz96 import Lorenz96

    if type(integrator) is not RK4Integrator:
        return False
    if not isinstance(integrator.model, Lorenz96):
        # arbitrary callables may not lower in Mosaic (gathers, host code)
        return False
    n = 1
    for d in state_shape:
        n *= int(d)
    return n * dtype_bytes <= _MAX_STATE_BYTES


def _rk4_body(model, dt):
    def body(_, x):
        k1 = model(x)
        k2 = model(x + (dt / 2.0) * k1)
        k3 = model(x + (dt / 2.0) * k2)
        k4 = model(x + dt * k3)
        return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    return body


def _rk4_kernel(state_ref, out_ref, *, model, dt, n_steps):
    out_ref[:] = jax.lax.fori_loop(0, n_steps, _rk4_body(model, dt),
                                   state_ref[:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2, 3, 4))
def _fused_rk4(model, state2, dt, n_steps, interpret):
    kernel = functools.partial(_rk4_kernel, model=model, dt=dt,
                               n_steps=n_steps)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(state2.shape, state2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(state2)


def _fused_rk4_fwd(model, state2, dt, n_steps, interpret):
    return _fused_rk4(model, state2, dt, n_steps, interpret), state2


def _fused_rk4_bwd(model, dt, n_steps, interpret, state2, g):
    # Backward replays the SAME arithmetic as the plain-XLA scan (bitwise
    # to reassociation) and reverse-differentiates it — so jax.grad
    # through a fused cycle step works exactly as through the XLA path
    # (round-4 advisor finding: a bare pallas_call has no VJP rule).
    def run(x):
        return jax.lax.fori_loop(0, n_steps, _rk4_body(model, dt), x)

    _, vjp = jax.vjp(run, state2)
    return (vjp(g)[0],)


_fused_rk4.defvjp(_fused_rk4_fwd, _fused_rk4_bwd)


@functools.partial(jax.jit,
                   static_argnames=("model", "dt", "n_steps", "interpret"))
def fused_rk4_steps(model, state, dt: float, n_steps: int,
                    interpret: bool | None = None):
    """``n_steps`` of classic RK4 under ``model`` as one Pallas kernel.

    ``model`` must be hashable (the model objects here are static config)
    and composed of Mosaic-lowerable jnp ops. ``state`` is any [..., g]
    ensemble that fits VMEM (callers gate on :func:`supports_fused_rk4`).
    Differentiable: carries a custom VJP whose backward replays the
    plain-XLA RK4 loop (the forward semantics up to reassociation).
    """
    from tpu_assim.ops.pallas.letkf import _resolve_interpret

    shape = state.shape
    state2 = state.reshape(-1, shape[-1])
    out = _fused_rk4(model, state2, float(dt), int(n_steps),
                     _resolve_interpret(interpret))
    return out.reshape(shape)
