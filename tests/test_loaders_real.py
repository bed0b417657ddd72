"""Loader contract tests for the locally-available REAL datasets.

The reference ships these files with its checkout (data/usa_temp_data.pt,
data/world_temp_data.pt, data/X_europe.pt + y_europe.pt, x.pt +
y_slc17a7.pt); the loaders re-implement its per-experiment ``load_*``
contract (SURVEY.md §2.3).  Tests skip when the files are absent.
"""
import numpy as np
import pytest


def _maybe(fn, *a, **k):
    try:
        return fn(*a, **k)
    except FileNotFoundError:
        pytest.skip("dataset file not available")


def test_world_temp_contract():
    from gpquad.utils.loaders import load_world_temp
    x, y = _maybe(load_world_temp)
    assert x.shape == (12396, 2) and y.shape == (12396,)
    # unit-square x, standardized y
    assert np.allclose(x.min(0), 0) and np.allclose(x.max(0), 1)
    assert abs(y.mean()) < 1e-10 and abs(y.std() - 1) < 1e-10
    xs, ys = _maybe(load_world_temp, n_sub=500, seed=0)
    assert xs.shape == (500, 2) and ys.shape == (500,)


def test_europe_pm25_contract():
    from gpquad.utils.loaders import load_europe_pm25
    x, y = _maybe(load_europe_pm25)
    assert x.shape[1] == 2 and len(x) == len(y) and len(y) > 3000
    assert np.allclose(x.min(0), 0) and np.allclose(x.max(0), 1)
    assert abs(y.mean()) < 1e-10 and abs(y.std() - 1) < 1e-10
    # raw readings are positive and heavy-tailed
    _, yr = _maybe(load_europe_pm25, log_target=False, standardize=False)
    assert yr.min() > 0 and yr.max() / np.median(yr) > 10
