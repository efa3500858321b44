"""Labeled DataArray: construction, selection, interpolation, math, IO."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.components.data.data_array import DataArray


def _make_field():
    coords = dict(x=np.linspace(-1, 1, 4), y=np.linspace(-1, 1, 5),
                  z=np.array([0.0]), f=np.array([1e14, 2e14]))
    vals = np.random.default_rng(0).normal(size=(4, 5, 1, 2)) + 0j
    return td.ScalarFieldDataArray(vals, coords=coords)


def test_construction_and_dims():
    arr = _make_field()
    assert arr.dims == ("x", "y", "z", "f")
    assert arr.shape == (4, 5, 1, 2)
    with pytest.raises(Exception):
        td.ScalarFieldDataArray(np.zeros((2, 2)), coords=dict(x=[0, 1], y=[0, 1]))


def test_transpose_on_input():
    coords = dict(f=np.array([1e14]), x=[0.0], y=[0.0], z=[0.0])
    arr = td.ScalarFieldDataArray(np.zeros((1, 1, 1, 1)), coords=coords)
    assert arr.dims == ("x", "y", "z", "f")


def test_sel_isel():
    arr = _make_field()
    assert arr.sel(f=2e14).shape == (4, 5, 1)
    assert arr.isel(x=0).shape == (5, 1, 2)
    assert arr.sel(f=[1e14, 2e14]).shape == (4, 5, 1, 2)
    nearest = arr.sel(x=0.1, method="nearest")
    assert nearest.shape == (5, 1, 2)


def test_interp_linear():
    coords = dict(x=np.array([0.0, 1.0]), y=np.array([0.0]), z=np.array([0.0]),
                  f=np.array([1e14]))
    arr = td.ScalarFieldDataArray(np.array([0.0, 2.0]).reshape(2, 1, 1, 1) + 0j,
                                  coords=coords)
    mid = arr.interp(x=0.25)
    assert np.isclose(mid.values[0, 0, 0], 0.5)
    multi = arr.interp(x=np.array([0.0, 0.5, 1.0]))
    assert np.allclose(multi.values[:, 0, 0, 0], [0, 1, 2])


def test_arithmetic_broadcast():
    arr = _make_field()
    total = (2 * arr + arr).values
    assert np.allclose(total, 3 * arr.values)
    assert np.allclose(abs(arr).values, np.abs(arr.values))
    # outer broadcast with different dims
    fl = td.FreqDataArray(np.array([2.0, 4.0]), coords=dict(f=arr.coords["f"]))
    prod = arr * fl
    assert prod.shape == arr.shape
    assert np.allclose(prod.values[..., 1], 4 * arr.values[..., 1])


def test_reductions_and_integrate():
    coords = dict(x=np.linspace(0, 1, 11), y=np.array([0.0]), z=np.array([0.0]),
                  f=np.array([1e14]))
    arr = td.ScalarFieldDataArray(
        np.ones((11, 1, 1, 1)), coords=coords)
    integral = arr.integrate("x")
    assert np.isclose(np.asarray(integral.values).squeeze(), 1.0)
    assert np.isclose(arr.sum("x").values.squeeze(), 11)


def test_hdf5_roundtrip(tmp_h5):
    arr = _make_field()
    arr.to_hdf5(tmp_h5, "data")
    arr2 = td.ScalarFieldDataArray.from_hdf5(tmp_h5, "data")
    assert arr2 == arr


def test_spatial_reflect():
    coords = dict(x=np.array([0.5, 1.0]), y=np.array([0.0]), z=np.array([0.0]))
    arr = td.SpatialDataArray(np.array([1.0, 2.0]).reshape(2, 1, 1), coords=coords)
    refl = arr.reflect(axis=0, center=0.0)
    assert len(refl.coords["x"]) == 4
    assert np.allclose(refl.coords["x"], [-1.0, -0.5, 0.5, 1.0])
    assert np.allclose(refl.values[:, 0, 0], [2, 1, 1, 2])
