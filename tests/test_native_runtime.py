"""
Native C++ runtime vs the JAX path and vs numpy.

The C++ solver (native/letkf_cpu.cpp, cyclic Jacobi eigensolver) and the
JAX eigh path implement the same reference math
(pytassim/core/etkf.py:57-77); both must agree to near machine precision.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_assim.ops.etkf import etkf_weights, letkf_weights_dense
from tpu_assim.runtime import (
    bucket_obs_cpu,
    etkf_weights_cpu,
    gaspari_cohn_cpu,
    letkf_weights_dense_cpu,
    native_available,
)

TOL = dict(rtol=1e-9, atol=1e-11)


def test_native_builds():
    """g++ is in the image; the native library must actually build."""
    assert native_available()


class TestNativeSolvers:
    def test_etkf_weights(self, rng):
        perts = rng.normal(size=(10, 25))
        perts -= perts.mean(axis=0, keepdims=True)
        innov = rng.normal(size=25)
        ours = etkf_weights_cpu(perts, innov, 1.1)
        expected = etkf_weights(jnp.asarray(perts), jnp.asarray(innov), 1.1)
        np.testing.assert_allclose(ours, np.asarray(expected), **TOL)

    def test_letkf_weights_dense(self, rng):
        k, o, g = 8, 30, 17
        perts = rng.normal(size=(k, o))
        perts -= perts.mean(axis=0, keepdims=True)
        innov = rng.normal(size=o)
        obs_w = np.where(rng.uniform(size=(g, o)) < 0.4, 0.0,
                         rng.uniform(0.1, 1.0, size=(g, o)))
        ours = letkf_weights_dense_cpu(perts, innov, obs_w, 1.2)
        expected = letkf_weights_dense(
            jnp.asarray(perts), jnp.asarray(innov), jnp.asarray(obs_w), 1.2
        )
        np.testing.assert_allclose(ours, np.asarray(expected), **TOL)

    def test_all_zero_weights_column(self, rng):
        """A column with all-zero obs weights degenerates to the inflated
        prior sqrt(rho) I (reference empty-obs path, core/etkf.py:91-95)."""
        k, o = 6, 12
        perts = rng.normal(size=(k, o))
        innov = rng.normal(size=o)
        obs_w = np.zeros((1, o))
        out = letkf_weights_dense_cpu(perts, innov, obs_w, 1.44)
        np.testing.assert_allclose(out[0], 1.2 * np.eye(k), rtol=1e-12,
                                   atol=1e-12)


class TestInputPath:
    def test_bucket_obs(self, rng):
        n_grid, n_shards = 128, 8
        obs_idx = rng.choice(n_grid, size=50, replace=True).astype(np.int32)
        order, counts, maxc = bucket_obs_cpu(obs_idx, n_grid, n_shards)
        assert counts.sum() == 50
        assert maxc == counts.max()
        # order groups obs by owner, stably
        owner_sorted = (obs_idx[order] // (n_grid // n_shards))
        assert (np.diff(owner_sorted) >= 0).all()
        assert sorted(order.tolist()) == list(range(50))

    def test_gaspari_cohn_matches_jax(self, rng):
        from tpu_assim.ops.localization import GaspariCohn

        grid = rng.uniform(0, 100, size=40)
        obs = rng.uniform(0, 100, size=30)
        native = gaspari_cohn_cpu(grid, obs, radius=10.0)

        def dist(gc, oi):
            return jnp.abs(oi[:, 0] - gc[0])[None, :]

        loc = GaspariCohn((10.0,), dist)
        expected = loc.taper_weights(
            jnp.asarray(grid)[:, None], jnp.asarray(obs)[:, None]
        )
        np.testing.assert_allclose(native, np.asarray(expected),
                                   rtol=1e-12, atol=1e-12)


class TestObsPipeline:
    """Background obs-ingest pipeline (native/obs_pipeline.cpp): TAOB file
    roundtrip, shard-bucketing parity with parallel.halo.shard_observations,
    prefetch ordering across files, and the numpy fallback."""

    def _make_batch(self, rng, n_grid, o, d=1):
        vals = rng.randn(o)
        var = rng.uniform(0.5, 1.5, size=o)
        gidx = rng.choice(n_grid, size=o, replace=False).astype(np.int64)
        coords = gidx.astype(np.float64)[:, None] * np.ones((1, d))
        return vals, var, gidx, coords

    def test_file_roundtrip(self, rng, tmp_path):
        from tpu_assim.runtime.obs_pipeline import (
            read_obs_file, write_obs_file)

        vals, var, gidx, coords = self._make_batch(rng, 64, 20, d=2)
        path = str(tmp_path / "obs.taob")
        write_obs_file(path, vals, var, gidx, coords)
        rv, rr, rg, rc = read_obs_file(path)
        np.testing.assert_array_equal(rv, vals)
        np.testing.assert_array_equal(rr, var)
        np.testing.assert_array_equal(rg, gidx)
        np.testing.assert_array_equal(rc, coords)

    @pytest.mark.parametrize("force_fallback", [False, True])
    def test_bucketing_matches_shard_observations(self, rng, tmp_path,
                                                  force_fallback,
                                                  monkeypatch):
        from tpu_assim.parallel.halo import shard_observations
        import tpu_assim.runtime.obs_pipeline as op

        if force_fallback:
            monkeypatch.setattr(op, "_lib", lambda: None)
        n_grid, n_shards, o = 128, 8, 40
        vals, var, gidx, coords = self._make_batch(rng, n_grid, o)
        path = str(tmp_path / "b0.taob")
        op.write_obs_file(path, vals, var, gidx, coords)

        ref_v, ref_r, ref_l, ref_c, ref_valid, p = shard_observations(
            vals, var, gidx, coords, n_grid, n_shards)
        with op.ObsLoader([path], n_grid, n_shards, cap=p) as loader:
            (idx, lv, lr, ll, lc, lvalid), = list(loader)
        assert idx == 0
        np.testing.assert_array_equal(lv, ref_v)
        np.testing.assert_array_equal(lvalid, ref_valid)
        np.testing.assert_array_equal(ll, ref_l)
        np.testing.assert_array_equal(lc[:, 0][lvalid > 0],
                                      ref_c[:, 0][ref_valid > 0])
        # padded variance slots: unit (isolated), real slots: exact
        np.testing.assert_array_equal(lr[lvalid > 0], ref_r[ref_valid > 0])

    def test_multi_file_prefetch_order(self, rng, tmp_path):
        from tpu_assim.runtime.obs_pipeline import ObsLoader, write_obs_file

        n_grid, n_shards = 64, 4
        batches = []
        paths = []
        for i in range(6):
            vals, var, gidx, coords = self._make_batch(rng, n_grid, 12)
            path = str(tmp_path / f"cycle{i}.taob")
            write_obs_file(path, vals, var, gidx, coords)
            batches.append(vals)
            paths.append(path)
        seen = []
        with ObsLoader(paths, n_grid, n_shards, cap=12, depth=3) as loader:
            for idx, lv, *_rest, lvalid in loader:
                seen.append(idx)
                got = np.sort(lv[lvalid > 0])
                np.testing.assert_array_equal(got, np.sort(batches[idx]))
        assert seen == list(range(6))

    def test_cap_overflow_raises(self, rng, tmp_path):
        from tpu_assim.runtime.obs_pipeline import ObsLoader, write_obs_file

        n_grid, n_shards = 64, 4
        # all obs in shard 0 -> cap 4 overflows
        gidx = np.arange(10, dtype=np.int64)
        vals = rng.randn(10)
        var = np.ones(10)
        coords = gidx.astype(np.float64)[:, None]
        path = str(tmp_path / "o.taob")
        write_obs_file(path, vals, var, gidx, coords)
        with pytest.raises(ValueError, match="cap"):
            with ObsLoader([path], n_grid, n_shards, cap=4) as loader:
                list(loader)
