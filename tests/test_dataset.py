"""Labeled-dataset layer unit tests (tpu_assim/utils/dataset.py — the
xarray-replacement the TerrSysMP adapters build on)."""

import numpy as np
import pytest

from tpu_assim.utils.dataset import Dataset, Variable


@pytest.fixture
def ds(rng):
    return Dataset(
        {
            "T": Variable(("time", "level", "x"),
                          rng.normal(size=(2, 3, 4))),
            "P": Variable(("time", "x"), rng.normal(size=(2, 4))),
        },
        coords={
            "time": np.array([0.0, 1.0]),
            "level": np.array([10.0, 20.0, 30.0]),
            "x": np.arange(4.0),
        },
    )


class TestVariable:
    def test_dims_rank_check(self):
        with pytest.raises(ValueError):
            Variable(("a",), np.zeros((2, 2)))

    def test_transpose(self, rng):
        v = Variable(("a", "b", "c"), rng.normal(size=(2, 3, 4)))
        t = v.transpose(("c", "a", "b"))
        assert t.shape == (4, 2, 3)
        np.testing.assert_array_equal(t.values[1, 0], v.values[0, :, 1])
        with pytest.raises(ValueError):
            v.transpose(("a", "b"))

    def test_expand_dims(self, rng):
        v = Variable(("a",), rng.normal(size=(3,)))
        e = v.expand_dims("ens", axis=0, size=4)
        assert e.dims == ("ens", "a") and e.shape == (4, 3)
        np.testing.assert_array_equal(e.values[2], v.values)


class TestDataset:
    def test_coord_length_validation(self, rng):
        with pytest.raises(ValueError):
            Dataset({"T": Variable(("x",), np.zeros(3))},
                    coords={"x": np.zeros(5)})

    def test_dims_union(self, ds):
        assert ds.dims == {"time": 2, "level": 3, "x": 4}

    def test_select(self, ds):
        sub = ds.select(["P", "missing"])
        assert "P" in sub and "T" not in sub
        assert "level" not in sub.coords

    def test_reindex_exact_match_with_nan_fill(self, ds):
        new_levels = np.array([20.0, 99.0, 10.0])
        out = ds.reindex("level", new_levels)
        t = out["T"].values
        np.testing.assert_array_equal(t[:, 0], ds["T"].values[:, 1])
        assert np.isnan(t[:, 1]).all()
        np.testing.assert_array_equal(t[:, 2], ds["T"].values[:, 0])
        # variables without the dim untouched
        np.testing.assert_array_equal(out["P"].values, ds["P"].values)

    def test_rename_dims(self, ds):
        out = ds.rename_dims({"level": "vgrid"})
        assert out["T"].dims == ("time", "vgrid", "x")
        assert "level" not in out.coords

    def test_rename_collision_raises(self, rng):
        d = Dataset({"T": Variable(("a", "b"), rng.normal(size=(2, 2)))})
        with pytest.raises(ValueError):
            d.rename_dims({"a": "b"})

    def test_copy_deep_isolation(self, ds):
        deep = ds.copy(deep=True)
        deep["T"].values[:] = 0.0
        assert not np.allclose(ds["T"].values, 0.0)
