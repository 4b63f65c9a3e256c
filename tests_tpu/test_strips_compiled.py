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


@if_tpu_decorator
def test_class_auto_strips_compiled():
    """LETKF(method='fused2d') class-level auto-strips on chip: the wide
    grid engages the strip plan and matches the pinned single-kernel
    run (round-5 class-API strip fold)."""
    from tpu_assim import EnsembleState, LETKF, Observation
    from tpu_assim.ops.localization import GaspariCohn

    nr, nc, k, o = 8, 640, 10, 256
    g = nr * nc
    rnd = np.random.RandomState(11)
    yy, xx = np.meshgrid(np.arange(nr, dtype="f4"),
                         np.arange(nc, dtype="f4"), indexing="ij")
    grid_xy = np.stack([xx.ravel(), yy.ravel()], 1)
    data = rnd.normal(size=(1, 1, k, g)).astype("f4")
    state = EnsembleState(jnp.asarray(data), times=jnp.asarray([0.0]),
                          grid_coords=jnp.asarray(grid_xy))
    obs_idx = np.sort(rnd.choice(g, size=o, replace=False))
    truth = np.asarray(state.data[0].mean(axis=1))[:, obs_idx]
    obs_vals = truth + rnd.normal(scale=0.5, size=truth.shape)

    def operator(obs, pseudo_state):
        return pseudo_state.data[0][:, :, obs_idx]

    obs = Observation(jnp.asarray(obs_vals.astype("f4")),
                      covariance=jnp.full((o,), np.float32(0.5)),
                      obs_coords=jnp.asarray(grid_xy[obs_idx]),
                      times=state.times, operator=operator)

    def dist2(gc, oi):
        return jnp.stack([jnp.abs(oi[:, 1] - gc[1]),
                          jnp.abs(oi[:, 2] - gc[2])], 0)

    loc = GaspariCohn((3.0, 3.0), dist2)
    auto = LETKF(localization=loc, inf_factor=1.1, max_obs=48,
                 method="fused2d", chunksize=None)
    out_auto = auto.assimilate(state, obs)
    assert auto._strip_cache is not None, "auto-strips did not engage"
    direct = LETKF(localization=loc, inf_factor=1.1, max_obs=48,
                   method="fused2d", chunksize=None, n_strips=1)
    out_dir = direct.assimilate(state, obs)
    a = np.asarray(out_auto.data, "f8")
    b = np.asarray(out_dir.data, "f8")
    assert np.isfinite(a).all()
    scale = max(np.abs(b).max(), 1.0)
    np.testing.assert_allclose(a, b, atol=5e-5 * scale, rtol=0)
