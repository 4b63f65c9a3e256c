"""Compiled-Mosaic smoke + parity for the x-strip production 2-D path
(make_strip_letkf_2d): the strip assembly must reproduce the single-call
fused2d analysis with the REAL DMA-banded kernel on chip (the CPU suite
covers interpret mode only)."""

import numpy as np

import jax.numpy as jnp

from tpu_assim.testing.decorators import if_tpu_decorator


@if_tpu_decorator
def test_strips_match_fused2d_compiled():
    from tpu_assim.analysis import make_letkf_analysis, make_strip_letkf_2d
    from tpu_assim.ops.localization import GaspariCohn
    from tpu_assim.ops.pallas.letkf import max_in_support_2d

    nr = nc = 128
    g, o, k = nr * nc, 512, 12
    rnd = np.random.RandomState(7)
    yy, xx = np.meshgrid(np.arange(nr, dtype="f4"),
                         np.arange(nc, dtype="f4"), indexing="ij")
    grid_xy = np.stack([xx.ravel(), yy.ravel()], 1)
    cells = np.sort(rnd.choice(g, size=o, replace=False)).astype(np.int32)
    obs_xy = grid_xy[cells]
    state = rnd.normal(size=(k, g)).astype("f4")
    vals = rnd.normal(size=o).astype("f4")
    var = np.ones(o, dtype="f4")

    def dist2(gc, oi):
        return jnp.stack([jnp.abs(oi[:, 1] - gc[1]),
                          jnp.abs(oi[:, 2] - gc[2])], 0)

    loc = GaspariCohn((4.0, 4.0), dist2)
    # nb sized for the worst of both tilings (strip tiles are taller)
    nb = max(8, max_in_support_2d(obs_xy, grid_xy, 4.0, 4.0)) + 8
    args = tuple(jnp.asarray(a) for a in
                 (state, vals, var, cells, grid_xy, obs_xy))
    direct = np.asarray(make_letkf_analysis(
        loc, 1.1, method="fused2d", max_obs=nb, cheb_degree=16)(*args))
    strips = np.asarray(make_strip_letkf_2d(
        loc, (cells, grid_xy, obs_xy), n_strips=2, inf_factor=1.1,
        max_obs=nb, cheb_degree=16,
    )(jnp.asarray(state), jnp.asarray(vals), jnp.asarray(var)))
    assert np.isfinite(strips).all()
    np.testing.assert_allclose(strips, direct, rtol=5e-5, atol=5e-5)
