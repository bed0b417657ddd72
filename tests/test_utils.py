"""Loader + gradient-oracle utility tests (model: reference tests/test_utils.py
and loader contracts in §2.3)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.utils.gradient_oracles import (compute_gradients_truncated,
                                           compute_gradients_vanilla,
                                           negative_log_marginal_likelihood)
from gpquad.utils.loaders import (load_co2, load_era5, load_oisst,
                                  load_roads, load_synthetic_gp, load_taxi)
from gpquad.kernels import SquaredExponential


def test_vanilla_gradient_matches_finite_difference(rng):
    x = jnp.asarray(rng.uniform(0, 1, (40, 1)))
    y = jnp.asarray(rng.normal(size=40))
    k = SquaredExponential(lengthscale=0.3, variance=1.2, dimension=1)
    g = np.asarray(compute_gradients_vanilla(k, x, y, 0.15))
    h = 1e-6
    def nll(l, v, s):
        kk = SquaredExponential(lengthscale=l, variance=v, dimension=1)
        return float(negative_log_marginal_likelihood(kk, x, y, s))
    fd = [(nll(0.3 + h, 1.2, 0.15) - nll(0.3 - h, 1.2, 0.15)) / (2 * h),
          (nll(0.3, 1.2 + h, 0.15) - nll(0.3, 1.2 - h, 0.15)) / (2 * h),
          (nll(0.3, 1.2, 0.15 + h) - nll(0.3, 1.2, 0.15 - h)) / (2 * h)]
    assert np.allclose(g, fd, rtol=1e-4)


def test_truncated_gradient_close_to_vanilla_at_tight_eps(rng):
    x = jnp.asarray(rng.uniform(0, 1, (50, 1)))
    y = jnp.asarray(rng.normal(size=50))
    k = SquaredExponential(lengthscale=0.3, variance=1.2, dimension=1)
    g_t, nll_t = compute_gradients_truncated(k, x, y, 0.15, eps=1e-8)
    g_v = compute_gradients_vanilla(k, x, y, 0.15)
    nll_v = negative_log_marginal_likelihood(k, x, y, 0.15)
    assert np.allclose(np.asarray(g_t), np.asarray(g_v), rtol=1e-4, atol=1e-4)
    assert np.allclose(float(nll_t), float(nll_v), rtol=1e-6)


def test_load_synthetic_gp():
    x, y = load_synthetic_gp(n=500, d=2, lengthscale=0.3, seed=1)
    assert x.shape == (500, 2) and y.shape == (500,)
    x2, y2 = load_synthetic_gp(n=500, d=2, lengthscale=0.3, seed=1)
    assert np.allclose(x, x2) and np.allclose(y, y2)  # deterministic
    x3, y3 = load_synthetic_gp(n=100, d=1, spectral=False)
    assert x3.shape == (100, 1)


def test_load_era5_roundtrip(tmp_path):
    import h5py
    p = tmp_path / "era5.nc"
    lat = np.linspace(90, -90, 7)
    lon = np.linspace(0, 359.75, 9)
    t2m = 280.0 + np.random.default_rng(0).normal(size=(1, 7, 9))
    with h5py.File(p, "w") as f:
        f["t2m"] = t2m
        f["latitude"] = lat
        f["longitude"] = lon
    x, y = load_era5(path=p)
    assert x.shape == (63, 2) and y.shape == (63,)
    assert x[:, 0].max() <= 180.0 and x[:, 0].min() >= -180.0
    assert np.allclose(y.mean(), t2m.mean() - 273.15, atol=1e-6)
    xs, ys = load_era5(n_sub=10, seed=1, path=p)
    assert xs.shape == (10, 2)
    xk, yk = load_era5(path=p, celsius=False)
    assert np.allclose(yk, y + 273.15)


def test_load_oisst_roundtrip(tmp_path):
    import h5py
    p = tmp_path / "oisst.nc"
    lat = np.linspace(-89.875, 89.875, 6).astype(np.float32)
    lon = np.linspace(0.125, 359.875, 8).astype(np.float32)
    raw = np.arange(48, dtype=np.int16).reshape(1, 1, 6, 8)
    raw[0, 0, 0, 0] = -999
    with h5py.File(p, "w") as f:
        f["lat"] = lat
        f["lon"] = lon
        d = f.create_dataset("sst", data=raw)
        d.attrs["_FillValue"] = np.int16(-999)
        d.attrs["scale_factor"] = np.float64(0.01)
        d.attrs["add_offset"] = np.float64(0.0)
    x, y = load_oisst(path=p)
    assert x.shape == (47, 2)  # one masked cell
    assert np.all(np.isfinite(y))
    assert abs(y.max() - 0.47) < 1e-6
    with pytest.raises(ValueError):
        load_oisst(path=p, variable="nope")


def test_load_roads_roundtrip(tmp_path):
    p = tmp_path / "roads.txt"
    rows = np.column_stack([np.arange(20), np.random.default_rng(0).uniform(8, 11, 20),
                            np.random.default_rng(1).uniform(56, 58, 20),
                            np.random.default_rng(2).uniform(0, 100, 20)])
    np.savetxt(p, rows, delimiter=",")
    x, y = load_roads(path=p)
    assert x.shape == (20, 2) and y.shape == (20,)
    xs, _ = load_roads(n_sub=5, path=p)
    assert xs.shape == (5, 2)


def test_load_taxi_roundtrip(tmp_path):
    import pandas as pd
    p = tmp_path / "taxi.csv"
    df = pd.DataFrame({
        "Pickup Centroid Longitude": [-87.6, -87.7, np.nan, -87.65],
        "Pickup Centroid Latitude": [41.88, 41.9, 41.85, 41.87],
        "Dropoff Centroid Longitude": [-87.62, -87.71, -87.66, -87.6],
        "Dropoff Centroid Latitude": [41.89, 41.91, 41.86, 41.88],
        "Trip Miles": [1.2, 3.4, 5.0, 2.2],
        "Trip Total": ["$10.50", "$22.00", "$31.25", "$15.75"],
    })
    df.to_csv(p, index=False)
    x, y = load_taxi(path=p)
    assert x.shape == (3, 2)  # NaN row dropped
    x2, y2 = load_taxi(path=p, target="trip_total")
    assert np.allclose(y2, [10.5, 22.0, 15.75])
    with pytest.raises(ValueError):
        load_taxi(path=p, target="nope")
    with pytest.raises(ValueError):
        load_taxi(path=p, feature_set="nope")


def test_load_co2_roundtrip(tmp_path):
    n = 15
    lat = np.random.default_rng(0).uniform(-60, 60, n)
    lon = np.random.default_rng(1).uniform(-180, 180, n)
    meas = np.random.default_rng(2).uniform(390, 410, n)
    np.stack([lat, lon]).astype(np.float64).tofile(tmp_path / "co2_xs.bin")
    meas.astype(np.float64).tofile(tmp_path / "co2_meas.bin")
    x, y = load_co2(path=tmp_path)
    assert x.shape == (n, 2)
    assert np.allclose(x[:, 0], lon) and np.allclose(x[:, 1], lat)
    x2, _ = load_co2(path=tmp_path, lonlat=False)
    assert np.allclose(x2[:, 0], lat)


def test_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_era5(path=tmp_path / "nope.nc")
    with pytest.raises(FileNotFoundError):
        load_co2(path=tmp_path / "nope")
