"""Compiled-Mosaic vs interpret-mode parity for the Pallas kernels, on the
real TPU chip (the CPU suite exercises only interpret mode; this closes the
round-1 gap that the compiled path was covered only indirectly by bench
runs). Skips when no TPU is attached."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_assim.testing.decorators import if_tpu_decorator


def _workload(rng, k=12, g=512, o=96):
    state = rng.randn(k, g).astype("f4")
    obs_x = np.sort(rng.uniform(0, g, size=o)).astype("f4")
    perts = rng.randn(k, o).astype("f4")
    innov = rng.randn(o).astype("f4")
    mean = state.mean(0)
    sp = state - mean
    return perts, innov, obs_x, state, sp, mean


class TestCompiledVsInterpret:
    @if_tpu_decorator
    def test_window_kernel(self, rng):
        from tpu_assim.ops.pallas.letkf import letkf_window_analysis_fused

        perts, innov, obs_x, state, sp, mean = _workload(rng)
        k, g = state.shape
        grid_x = np.arange(g, dtype="f4")
        reg = jnp.asarray((k - 1) / 1.1, jnp.float32)
        args = (jnp.asarray(perts), jnp.asarray(innov), jnp.asarray(obs_x),
                jnp.asarray(grid_x), jnp.asarray(sp), jnp.asarray(mean),
                reg, 8.0, k)
        compiled = letkf_window_analysis_fused(*args, nb=16, degree=12,
                                               interpret=False)
        interp = letkf_window_analysis_fused(*args, nb=16, degree=12,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp),
                                   rtol=2e-5, atol=2e-5)

    @if_tpu_decorator
    def test_cheb_kernel(self, rng):
        from tpu_assim.ops.pallas.letkf import letkf_nbh_analysis_cheb

        k, o, g, nb = 12, 96, 512, 16
        perts = rng.randn(k, o).astype("f4")
        innov = rng.randn(o).astype("f4")
        idx = rng.randint(0, o, size=(g, nb)).astype("i4")
        w = rng.rand(g, nb).astype("f4")
        state = rng.randn(k, g).astype("f4")
        sw = np.sqrt(w)
        zh = np.transpose(perts[:, idx], (2, 0, 1)) * sw.T[:, None, :]
        yh = innov[idx].T * sw.T
        mean = state.mean(0)
        sp = state - mean
        reg = jnp.asarray((k - 1) / 1.1, jnp.float32)
        args = (jnp.asarray(zh), jnp.asarray(yh), jnp.asarray(sp),
                jnp.asarray(mean), reg, k)
        compiled = letkf_nbh_analysis_cheb(*args, degree=12,
                                           interpret=False)
        interp = letkf_nbh_analysis_cheb(*args, degree=12, interpret=True)
        np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp),
                                   rtol=2e-5, atol=2e-5)

    @if_tpu_decorator
    def test_window2d_kernel(self, rng):
        from tpu_assim.ops.pallas.letkf import (
            letkf_window_analysis_fused_2d, required_obs_block_2d)

        nr = nc = 24
        g = nr * nc
        k, o = 8, 80
        yy, xx = np.meshgrid(np.arange(nr, dtype="f4"),
                             np.arange(nc, dtype="f4"), indexing="ij")
        grid_xy = np.stack([xx.ravel(), yy.ravel()], 1)
        obs_xy = grid_xy[rng.choice(g, size=o, replace=False)]
        perts = rng.randn(k, o).astype("f4")
        innov = rng.randn(o).astype("f4")
        state = rng.randn(k, g).astype("f4")
        mean = state.mean(0)
        sp = state - mean
        blk = required_obs_block_2d(obs_xy[:, 1], grid_xy[:, 1], 4.0)
        reg = jnp.asarray((k - 1) / 1.1, jnp.float32)
        args = (jnp.asarray(perts), jnp.asarray(innov), jnp.asarray(obs_xy),
                jnp.asarray(grid_xy), jnp.asarray(sp), jnp.asarray(mean),
                reg, 4.0, 4.0, k)
        compiled = letkf_window_analysis_fused_2d(
            *args, obs_block=blk, nb=48, degree=16, interpret=False)
        interp = letkf_window_analysis_fused_2d(
            *args, obs_block=blk, nb=48, degree=16, interpret=True)
        np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp),
                                   rtol=2e-5, atol=2e-5)

    @if_tpu_decorator
    def test_newton_fused_kernel(self, rng):
        from tpu_assim.ops.pallas.letkf import letkf_nbh_analysis_fused

        k, g, nb = 12, 512, 16
        zh = (rng.randn(g, nb, k) * 0.5).astype("f4")
        yh = rng.randn(g, nb).astype("f4")
        sp = rng.randn(g, k).astype("f4")
        mean = rng.randn(g).astype("f4")
        reg = jnp.asarray((k - 1) / 1.1, jnp.float32)
        args = (jnp.asarray(zh), jnp.asarray(yh), jnp.asarray(sp),
                jnp.asarray(mean), reg, k)
        compiled = letkf_nbh_analysis_fused(*args, num_iters=14,
                                            interpret=False)
        interp = letkf_nbh_analysis_fused(*args, num_iters=14,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp),
                                   rtol=2e-5, atol=2e-5)


class TestClassApiCompiled:
    """End-to-end LETKF.assimilate() on the chip: the fused monolithic
    kernels through the full class API (state/obs plumbing + host-side
    guards + Pallas compiled) against the eigh path, plus a compiled VJP
    smoke for the custom-backward kernels (VERDICT r2 #7)."""

    def _state_obs(self, rng, n_grid=512, n_obs=96, n_ens=10):
        from tpu_assim import EnsembleState, Observation

        data = rng.randn(2, 1, n_ens, n_grid).astype("f4")
        state = EnsembleState(
            jnp.asarray(data),
            times=jnp.arange(1, dtype=jnp.float32),
            grid_coords=jnp.arange(n_grid, dtype=jnp.float32)[:, None],
            var_names=("x", "y"),
        )
        obs_idx = np.sort(rng.choice(n_grid, size=n_obs, replace=False))
        # data[0][:, :, obs_idx]: [time=1, ens, obs] -> ens-mean [1, obs]
        vals = np.asarray(data[0][:, :, obs_idx].mean(1)) \
            + rng.randn(1, n_obs).astype("f4")

        def operator(obs, pseudo_state):
            return pseudo_state.data[0][:, :, obs_idx]

        obs = Observation(
            jnp.asarray(vals.astype("f4")),
            covariance=jnp.full((n_obs,), 0.5, jnp.float32),
            obs_coords=state.grid_coords[obs_idx],
            times=state.times,
            operator=operator,
        )
        return state, obs

    @if_tpu_decorator
    @pytest.mark.parametrize("method", ["cheb", "fused1d"])
    def test_fused_assimilate_matches_eigh_on_chip(self, rng, method):
        from tpu_assim import LETKF
        from tpu_assim.ops.localization import GaspariCohn

        def dist(gc, oi):
            return jnp.abs(oi[:, 1] - gc[1])[None, :]

        loc = GaspariCohn((8.0,), dist)
        state, obs = self._state_obs(rng)
        exact = LETKF(localization=loc, inf_factor=1.1, max_obs=40,
                      method="eigh", chunksize=None).assimilate(state, obs)
        fused = LETKF(localization=loc, inf_factor=1.1, max_obs=40,
                      method=method, chunksize=None).assimilate(state, obs)
        a = np.asarray(fused.data, np.float64)
        b = np.asarray(exact.data, np.float64)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, atol=5e-3 * np.abs(b).max(),
                                   rtol=0)

    @if_tpu_decorator
    def test_window_kernel_compiled_vjp(self, rng):
        """Compiled forward + plain-XLA custom backward on the chip:
        d(analysis)/d(inf rho) through the monolithic window kernel is
        finite and matches the interpret-mode gradient."""
        from tpu_assim.ops.pallas.letkf import letkf_window_analysis_fused

        k, g, o = 8, 256, 48
        state = rng.randn(k, g).astype("f4")
        obs_x = np.sort(rng.uniform(0, g, size=o)).astype("f4")
        perts = (rng.randn(k, o) * 0.5).astype("f4")
        innov = rng.randn(o).astype("f4")
        mean = state.mean(0)
        sp = state - mean

        def loss(rho, interpret):
            reg = ((k - 1) / rho).astype(jnp.float32)
            out = letkf_window_analysis_fused(
                jnp.asarray(perts), jnp.asarray(innov), jnp.asarray(obs_x),
                jnp.arange(g, dtype=jnp.float32), jnp.asarray(sp),
                jnp.asarray(mean), reg, 8.0, k, nb=24, degree=12,
                interpret=interpret)
            return jnp.sum(out ** 2)

        g_c = jax.grad(lambda r: loss(r, False))(jnp.float32(1.1))
        g_i = jax.grad(lambda r: loss(r, True))(jnp.float32(1.1))
        assert np.isfinite(float(g_c))
        np.testing.assert_allclose(float(g_c), float(g_i), rtol=2e-3)


class TestRdmaCompiledSmoke:
    """COMPILE the Pallas RDMA halo kernel for the real chip. The CPU
    suite and the dryrun cover it only in interpret mode, where the
    barrier-semaphore rendezvous and the remote DMAs are explicitly gated
    off (parallel/halo.py) — a Mosaic lowering regression would ship
    undetected without this (this smoke caught the unaligned-slice
    dma_start failure: remote-DMA destinations must be (8, 128)-tile
    aligned, fixed by padding in _ring_halo_rdma). Compile-only: actually
    RUNNING a collective launch on one chip wedges the TPU waiting for
    its launch-barrier peers (observed 2026-08-20 — a killed client does
    not unwedge it), and multi-chip execution parity belongs on real
    multi-chip hardware."""

    @if_tpu_decorator
    def test_ring_halo_rdma_mosaic_lowering(self, rng, monkeypatch):
        from jax.sharding import Mesh, PartitionSpec as P

        import tpu_assim.parallel.halo as hal

        monkeypatch.setattr(hal, "_halo_offsets", lambda n, h: [0])
        mesh = Mesh(np.array(jax.devices()[:1]), ("grid",))
        # deliberately tile-UNALIGNED [rows, o_ps] — the regression shape
        packed = jnp.asarray(rng.randn(8, 16).astype("f4"))
        fn = jax.jit(jax.shard_map(
            lambda p: hal._ring_halo_rdma(p, "grid", 1, 1,
                                          interpret=False),
            mesh=mesh, in_specs=P(None, "grid"),
            out_specs=P(None, "grid"), check_vma=False))
        compiled = fn.lower(packed).compile()  # Mosaic lowering must pass
        assert compiled is not None


class TestWindowedHaloCompiled:
    """The windowed halo local solve (local_method='window': sorted ring
    concat + per-shard monolithic window kernel) compiled and RUN on the
    chip with a 1-device mesh — ppermute on a singleton ring executes
    fine (unlike the RDMA launch barrier), so this covers the full
    compiled path: wrap sentinels, pad pinning, and the Mosaic kernel."""

    @if_tpu_decorator
    def test_windowed_halo_runs_compiled(self, rng):
        from jax.sharding import Mesh

        from tpu_assim.analysis import make_letkf_analysis
        from tpu_assim.ops.localization import GaspariCohn
        from tpu_assim.parallel.halo import (
            halo_letkf_analysis, halo_width_for, shard_observations)

        def dist(gc, oi):
            return jnp.abs(oi[:, 1] - gc[1])[None, :]

        k, g, o, radius = 10, 512, 64, 8.0
        state = rng.randn(k, g).astype("f4")
        obs_idx = np.sort(rng.choice(g, size=o, replace=False)).astype("i4")
        obs_vals = rng.randn(o).astype("f4")
        obs_var = np.ones(o, dtype="f4")
        grid_coords = np.arange(g, dtype="f4")[:, None]
        obs_coords = grid_coords[obs_idx]
        loc = GaspariCohn((radius,), dist)

        dense = make_letkf_analysis(loc, inf_factor=1.1, method="eigh",
                                    chunksize=None)
        expected = np.asarray(dense(
            jnp.asarray(state), jnp.asarray(obs_vals), jnp.asarray(obs_var),
            jnp.asarray(obs_idx), jnp.asarray(grid_coords),
            jnp.asarray(obs_coords)))

        mesh = Mesh(np.array(jax.devices()[:1]), ("grid",))
        vals, var, lidx, coords, valid, _ = shard_observations(
            obs_vals, obs_var, obs_idx, obs_coords, g, 1)
        analyse = halo_letkf_analysis(
            mesh, loc, max_obs=24,
            halo_width=halo_width_for(radius, float(g)), inf_factor=1.1,
            local_method="window", cheb_degree=32)
        out = np.asarray(analyse(
            jnp.asarray(state), jnp.asarray(vals), jnp.asarray(var),
            jnp.asarray(lidx), jnp.asarray(coords), jnp.asarray(valid),
            jnp.asarray(grid_coords)))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, expected, rtol=5e-3, atol=5e-4)


class TestJacobiCompiled:
    """The Brent-Luk fori_loop kernel is the DEFAULT TPU eigh dispatch
    (ops/linalg.py:eigh_psd). Measured on v5e 2026-08-20
    (scripts/validate_jacobi.py): compile 12.8 s at [10^4, 40, 40] f32,
    eigenvector orthogonality ~1e-5 compiled (incl. a 24-fold degenerate
    cluster), reconstruction at the f32 floor, 3.2x vs XLA eigh."""

    @if_tpu_decorator
    def test_jacobi_compiled_degenerate_cluster(self, rng):
        from tpu_assim.ops.pallas.jacobi import eigh_jacobi

        k, b, cluster = 40, 512, 24
        # rank-16 Gram + 4.33 I: a 24-fold degenerate eigenvalue at 4.33
        z = rng.randn(b, k, 16).astype("f4")
        a64 = np.einsum("bki,bmi->bkm", z.astype("f8"), z.astype("f8"))
        a64 += np.eye(k) * 4.33
        a = jnp.asarray(a64, jnp.float32)
        ev_c, vec_c = eigh_jacobi(a, interpret=False)
        scale = float(np.abs(a64).max())
        # against the f64 oracle, not interpret mode
        ev_ref = np.linalg.eigvalsh(a64)
        assert float(jnp.abs(ev_c - ev_ref).max()) < 1e-4 * scale
        vec = np.asarray(vec_c, np.float64)
        rec = np.einsum("bik,bk,bjk->bij", vec, np.asarray(ev_c, "f8"), vec)
        assert np.abs(rec - a64).max() < 5e-4 * scale
        orth = np.einsum("bki,bkj->bij", vec, vec)
        assert np.abs(orth - np.eye(k)).max() < 2e-5

    @if_tpu_decorator
    def test_eigh_psd_dispatches_to_jacobi(self, rng, monkeypatch):
        """eigh_psd on TPU routes large f32 batches to the one-sided
        Pallas kernel by default, to the two-sided kernel with
        TPU_ASSIM_EIGH_KERNEL=twosided, and to XLA with
        TPU_ASSIM_JACOBI=0."""
        import tpu_assim.ops.pallas.jacobi as jac
        import tpu_assim.ops.pallas.svd as svdmod
        from tpu_assim.ops import linalg

        calls = []
        orig_one = svdmod.eigh_svd_jacobi
        monkeypatch.setattr(
            svdmod, "eigh_svd_jacobi",
            lambda *a, **kw: calls.append("one") or orig_one(*a, **kw),
        )
        orig_two = jac.eigh_jacobi
        monkeypatch.setattr(
            jac, "eigh_jacobi",
            lambda *a, **kw: calls.append("two") or orig_two(*a, **kw),
        )
        z = rng.randn(512, 40, 16).astype("f4")
        a = jnp.asarray(np.einsum("bki,bmi->bkm", z, z)
                        + np.eye(40, dtype="f4"))
        w, v = linalg.eigh_psd(a)
        assert calls == ["one"], calls
        w_ref = np.linalg.eigvalsh(np.asarray(a, "f8"))
        assert np.abs(np.asarray(w, "f8") - w_ref).max() < 1e-4 * float(
            np.abs(w_ref).max()
        )
        monkeypatch.setenv("TPU_ASSIM_EIGH_KERNEL", "twosided")
        calls.clear()
        linalg.eigh_psd(a)
        assert calls == ["two"], calls
        monkeypatch.setenv("TPU_ASSIM_JACOBI", "0")
        calls.clear()
        linalg.eigh_psd(a)
        assert not calls


class TestSVDCompiled:
    """The one-sided Hestenes SVD kernel compiled on chip (the IEnKS
    native obligation, SURVEY §2.10) and its eigh wrapper — measured on
    v5e 2026-08-21 (scripts/validate_svd.py, scripts/validate_eigh_svd.py):
    106 ms / 115 ms at [10^4, 40, 40] f32 vs 1537 / 982 ms XLA."""

    @if_tpu_decorator
    def test_svd_compiled_vs_f64_oracle(self, rng):
        from tpu_assim.ops.pallas.svd import svd_jacobi

        b, k = 512, 40
        a64 = rng.randn(b, k, k).astype("f8")
        a = jnp.asarray(a64, jnp.float32)
        u, s, v = svd_jacobi(a, interpret=False)
        s_ref = np.linalg.svd(a64, compute_uv=False)
        assert np.abs(np.asarray(s, "f8") - s_ref).max() < 1e-4 * float(
            s_ref.max()
        )
        u = np.asarray(u, "f8")
        v = np.asarray(v, "f8")
        rec = np.einsum("bik,bk,bjk->bij", u, np.asarray(s, "f8"), v)
        assert np.abs(rec - a64).max() < 1e-4 * float(np.abs(a64).max())
        for q in (u, v):
            orth = np.einsum("bki,bkj->bij", q, q)
            assert np.abs(orth - np.eye(k)).max() < 1e-4

    @if_tpu_decorator
    def test_eigh_svd_compiled_degenerate_cluster(self, rng):
        """Same workload as the two-sided compiled test — the one-sided
        dispatch must hold the same quality bars."""
        from tpu_assim.ops.pallas.svd import eigh_svd_jacobi

        k, b = 40, 512
        z = rng.randn(b, k, 16).astype("f4")
        a64 = np.einsum("bki,bmi->bkm", z.astype("f8"), z.astype("f8"))
        a64 += np.eye(k) * 4.33
        a = jnp.asarray(a64, jnp.float32)
        ev_c, vec_c = eigh_svd_jacobi(a, interpret=False)
        scale = float(np.abs(a64).max())
        ev_ref = np.linalg.eigvalsh(a64)
        assert float(jnp.abs(ev_c - ev_ref).max()) < 1e-4 * scale
        vec = np.asarray(vec_c, np.float64)
        rec = np.einsum("bik,bk,bjk->bij", vec, np.asarray(ev_c, "f8"), vec)
        assert np.abs(rec - a64).max() < 5e-4 * scale
        orth = np.einsum("bki,bkj->bij", vec, vec)
        assert np.abs(orth - np.eye(k)).max() < 2e-5


class TestLKETKFChebCompiled:
    """LKETKF(method='cheb') — the fused vector-only Chebyshev kernelized
    analysis — vs the eigh weight path, both compiled on chip (CPU suite
    covers f64; the bench-measured compiled parity is ~7e-6)."""

    @if_tpu_decorator
    def test_cheb_matches_eigh_compiled(self, rng):
        import jax.numpy as jnp

        from tpu_assim import EnsembleState, LKETKF, Observation
        from tpu_assim.ops.kernels import GaussKernel
        from tpu_assim.ops.localization import GaspariCohn
        from tpu_assim.testing import dummy_distance, dummy_obs_operator

        g, k = 256, 10
        data = rng.randn(1, 1, k, g).astype("f4")
        state = EnsembleState(
            jnp.asarray(data), times=jnp.asarray([0.0], jnp.float32),
            grid_coords=jnp.asarray(np.arange(g, dtype="f4"))[:, None],
        )
        truth = np.asarray(state.data[0].mean(axis=1))
        obs_vals = truth + rng.normal(scale=0.5, size=truth.shape)
        obs = Observation(
            jnp.asarray(obs_vals.astype("f4")),
            covariance=jnp.full((g,), np.float32(0.5)),
            obs_coords=state.grid_coords, times=state.times,
            operator=dummy_obs_operator(),
        )
        loc = GaspariCohn((8.0,), dummy_distance)
        exact = LKETKF(localization=loc, kernel=GaussKernel(),
                       inf_factor=1.1, chunksize=None, max_obs=34,
                       selection="window").assimilate(state, obs)
        cheb = LKETKF(localization=loc, kernel=GaussKernel(),
                      inf_factor=1.1, chunksize=None, max_obs=34,
                      selection="window",
                      method="cheb").assimilate(state, obs)
        a = np.asarray(cheb.data, "f8")
        b = np.asarray(exact.data, "f8")
        assert np.isfinite(a).all()
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=5e-5 * scale, rtol=0)
