"""Format-faithful synthetic stand-ins for the six raw-file loaders.

The era5/oisst/prism/roads/taxi/co2 raw files don't exist in this
environment, so tests/test_loaders_real.py skips them and the parse paths
were dead code (VERDICT r3 missing #4).  These tests WRITE tiny files in
the exact on-disk formats the reference experiments consume
(era5_experiment/load_era5.py, oisst_experiment/load_oisst.py,
prism_experiment/load_prism.py, roads_experiment/load_roads.py,
taxi_experiment/load_taxi.py, co2_experiment/load_co2.py) and drive every
branch of the parsers: unit scaling, fill-value masking, longitude
wrapping, geotransform tags, currency stripping, column-major binary
layout, and subsampling.
"""
import numpy as np
import pytest


def test_era5_parses_netcdf_bytes(tmp_path):
    h5py = pytest.importorskip("h5py")
    from gpquad.utils.loaders import load_era5
    lat = np.linspace(90, -90, 7)
    lon = np.arange(0, 360, 30.0) + 15.0     # includes lon > 180
    t2m = 273.15 + np.arange(7 * 12, dtype=np.float64).reshape(1, 7, 12)
    p = tmp_path / "era5.nc"
    with h5py.File(p, "w") as f:
        f["t2m"] = t2m
        f["latitude"] = lat
        f["longitude"] = lon
    x, y = load_era5(path=p)
    assert x.shape == (84, 2) and y.shape == (84,)
    assert x[:, 0].min() >= -180 and x[:, 0].max() < 180  # wrapped
    assert np.isclose(y[0], 0.0)                          # Kelvin -> C
    xs, ys = load_era5(path=p, n_sub=10, seed=1)
    assert xs.shape == (10, 2)
    xk, yk = load_era5(path=p, celsius=False)
    assert np.isclose(yk[0], 273.15)


def test_oisst_parses_scaled_int16_raster(tmp_path):
    h5py = pytest.importorskip("h5py")
    from gpquad.utils.loaders import load_oisst, load_oisst_grid
    lat = np.array([-10.0, 0.0, 10.0], np.float32)
    lon = np.array([10.0, 190.0, 350.0], np.float32)      # wraps to W
    raw = np.array([[[[100, -999, 300],
                      [400, 500, 600],
                      [700, 800, -999]]]], np.int16)
    p = tmp_path / "oisst.nc"
    with h5py.File(p, "w") as f:
        f["lat"] = lat
        f["lon"] = lon
        ds = f.create_dataset("sst", data=raw)
        ds.attrs["_FillValue"] = np.int16(-999)
        ds.attrs["scale_factor"] = np.float32(0.01)
        ds.attrs["add_offset"] = np.float32(0.0)
    LON, LAT, data = load_oisst_grid(path=p)
    assert LON.shape == (3, 3)
    assert np.all(np.diff(LON[0]) > 0) and LON[0, 0] < 0  # reordered west
    assert np.isnan(data).sum() == 2                      # fill masked
    x, y = load_oisst(path=p)
    assert x.shape == (7, 2) and np.all(np.isfinite(y))
    assert np.isclose(np.nanmax(data), 8.0)               # 800 * 0.01
    with pytest.raises(ValueError):
        load_oisst(path=p, variable="nope")
    with pytest.raises(ValueError):
        load_oisst(path=p, lon_range="bad")


def test_prism_parses_geotiff_tags(tmp_path):
    Image = pytest.importorskip("PIL.Image")
    from PIL import TiffImagePlugin
    from gpquad.utils.loaders import load_prism_dataset
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    data[0, 0] = -9999.0                                  # nodata pixel
    ddir = tmp_path / "prism_test"
    ddir.mkdir()
    img = Image.fromarray(data, mode="F")
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (0.5, 0.25, 0.0)                        # ModelPixelScale
    info[33922] = (0.0, 0.0, 0.0, -120.0, 49.0, 0.0)      # ModelTiepoint
    info[42113] = "-9999"                                 # GDAL nodata
    img.save(ddir / "raster.tif", tiffinfo=info)
    x, y = load_prism_dataset(str(ddir))
    assert x.shape == (11, 2) and y.shape == (11,)        # nodata dropped
    assert np.isclose(x[:, 0].min(), -120.0 + 0.5 * 0.5)  # geotransform
    assert np.isclose(x[:, 1].max(), 49.0 - 0.5 * 0.25)
    assert -9999.0 not in y


def test_roads_parses_csv(tmp_path):
    from gpquad.utils.loaders import load_roads
    rows = np.column_stack([np.arange(5), np.linspace(9, 10, 5),
                            np.linspace(57, 58, 5), np.arange(5) * 2.0])
    p = tmp_path / "3D_spatial_network.txt"
    np.savetxt(p, rows, delimiter=",")
    x, y = load_roads(path=p)
    assert x.shape == (5, 2)
    assert np.allclose(x[:, 0], np.linspace(9, 10, 5))
    assert np.allclose(y, np.arange(5) * 2.0)


def test_taxi_parses_currency_and_nans(tmp_path):
    pd = pytest.importorskip("pandas")
    from gpquad.utils.loaders import load_taxi
    df = pd.DataFrame({
        "Pickup Centroid Longitude": [-87.6, -87.7, None, -87.8],
        "Pickup Centroid Latitude": [41.8, 41.9, 41.7, 41.6],
        "Dropoff Centroid Longitude": [-87.5, -87.6, -87.7, -87.8],
        "Dropoff Centroid Latitude": [41.9, 41.8, 41.7, 41.6],
        "Trip Miles": [1.2, 3.4, 5.6, 7.8],
        "Trip Total": ["$10.50", "$2,000.00", "$5.00", "bad"],
    })
    p = tmp_path / "taxi_trips.csv"
    df.to_csv(p, index=False)
    x, y = load_taxi(path=p)                              # trip_miles
    assert x.shape == (3, 2)                              # NaN row dropped
    x2, y2 = load_taxi(path=p, target="trip_total")
    assert y2.tolist() == [10.5, 2000.0]                  # $ and , stripped
    with pytest.raises(ValueError):
        load_taxi(path=p, feature_set="nope")
    with pytest.raises(ValueError):
        load_taxi(path=p, target="nope")


def test_co2_parses_matlab_binary_pair(tmp_path):
    from gpquad.utils.loaders import load_co2
    n = 9
    lat = np.linspace(-60, 60, n)
    lon = np.linspace(-150, 150, n)
    meas = 400 + np.arange(n, dtype=np.float64)
    ddir = tmp_path / "co2_data"
    ddir.mkdir()
    meas.tofile(ddir / "co2_meas.bin")
    np.concatenate([lat, lon]).tofile(ddir / "co2_xs.bin")  # column-major
    x, y = load_co2(path=ddir)
    assert np.allclose(x[:, 0], lon) and np.allclose(x[:, 1], lat)
    assert np.allclose(y, meas)
    x2, _ = load_co2(path=ddir, lonlat=False)
    assert np.allclose(x2[:, 0], lat)
    xs, ys = load_co2(path=ddir, n_sub=4, seed=0)
    assert xs.shape == (4, 2)


def test_missing_files_raise(tmp_path):
    from gpquad.utils.loaders import (load_co2, load_era5, load_roads)
    with pytest.raises(FileNotFoundError):
        load_era5(path=tmp_path / "nope.nc")
    with pytest.raises(FileNotFoundError):
        load_roads(path=tmp_path / "nope.txt")
    with pytest.raises(FileNotFoundError):
        load_co2(path=tmp_path / "empty")
