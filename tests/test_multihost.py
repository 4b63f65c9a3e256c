"""Multi-host runner helpers (single-process behavior) + profiling trace +
native-runtime fallback robustness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestMultihostHelpers:
    def test_process_info_single_process(self):
        from tpu_assim.parallel.multihost import process_info

        info = process_info()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8

    def test_global_grid_mesh(self):
        from tpu_assim.parallel.multihost import global_grid_mesh

        mesh = global_grid_mesh()
        assert mesh.axis_names == ("grid",)
        assert mesh.devices.size == 8

    def test_host_local_to_global_roundtrip(self, rng):
        from tpu_assim.parallel.multihost import (
            global_grid_mesh,
            host_local_to_global,
        )

        mesh = global_grid_mesh()
        local = rng.normal(size=(4, 64))  # single process owns everything
        arr = host_local_to_global(mesh, local, axis=-1)
        assert arr.shape == (4, 64)
        np.testing.assert_array_equal(np.asarray(arr), local)
        # grid axis is sharded
        assert arr.sharding.spec[-1] == "grid"

    def test_initialize_multihost_single_process_noop(self):
        from tpu_assim.parallel.multihost import initialize_multihost

        # must not raise in a single-process CPU environment
        initialize_multihost()


class TestProfilerTrace:
    def test_trace_writes_artifacts(self, tmp_path, rng):
        from tpu_assim.utils.profiling import trace

        with trace(str(tmp_path)):
            x = jnp.asarray(rng.normal(size=(64, 64)))
            (x @ x).block_until_ready()
        produced = list(tmp_path.rglob("*"))
        assert produced, "profiler trace produced no files"


class TestNativeFallback:
    def test_numpy_fallback_matches_native(self, rng, monkeypatch):
        import tpu_assim.runtime.native as rt

        perts = rng.normal(size=(6, 20))
        innov = rng.normal(size=20)
        obs_w = rng.uniform(size=(5, 20))
        native = rt.letkf_weights_dense_cpu(perts, innov, obs_w, 1.1)
        monkeypatch.setattr(rt, "_load", lambda: None)
        fallback = rt.letkf_weights_dense_cpu(perts, innov, obs_w, 1.1)
        np.testing.assert_allclose(fallback, native, rtol=1e-9, atol=1e-11)

    def test_bucket_fallback_matches_native(self, rng, monkeypatch):
        import tpu_assim.runtime.native as rt

        obs_idx = rng.choice(64, size=30).astype(np.int32)
        o1, c1, m1 = rt.bucket_obs_cpu(obs_idx, 64, 8)
        monkeypatch.setattr(rt, "_load", lambda: None)
        o2, c2, m2 = rt.bucket_obs_cpu(obs_idx, 64, 8)
        np.testing.assert_array_equal(c1, c2)
        assert m1 == m2
        # same grouping (order within groups is stable in both)
        np.testing.assert_array_equal(obs_idx[o1] // 8, obs_idx[o2] // 8)
