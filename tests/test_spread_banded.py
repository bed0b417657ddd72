"""Banded (scatter-free) spread NUFFT tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.nufft import make_nufft
from gpquad.ops.spread_banded import (banded_nufft1_2d, banded_nufft2_2d,
                                      banded_plan_cap)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, mtot, h = 2500, 23, 0.31
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)))
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    f = jnp.asarray(rng.normal(size=(mtot, mtot))
                    + 1j * rng.normal(size=(mtot, mtot)))
    cap = banded_plan_cap(np.asarray(x), h, mtot, w=8)
    op = make_nufft(x, h, mtot)
    return x, v, f, op, mtot, h, cap


def test_banded_type1_matches_exact(setup):
    x, v, f, op, mtot, h, cap = setup
    got = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8, cap=cap))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_banded_type2_matches_exact(setup):
    x, v, f, op, mtot, h, cap = setup
    got = np.asarray(banded_nufft2_2d(x, f, h, mtot=mtot, w=8, cap=cap))
    want = np.asarray(op.type2(f))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_banded_matches_scatter_spread(setup):
    """Identical algorithm, different data movement: banded == scatter."""
    from gpquad.ops.spread_nufft import spread_nufft1_2d
    x, v, f, op, mtot, h, cap = setup
    b = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8, cap=cap))
    s = np.asarray(spread_nufft1_2d(x, v, h, mtot=mtot, w=8))
    assert np.abs(b - s).max() < 1e-10 * np.abs(s).max()


def test_cap_chunking(setup):
    """cap > 512 triggers the scan over cap-chunks; results identical."""
    x, v, f, op, mtot, h, cap = setup
    a = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8, cap=cap))
    b = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8,
                                    cap=max(cap, 520)))
    assert np.abs(a - b).max() < 1e-10 * np.abs(a).max()


def test_plan_cap_reasonable():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 10, (10000, 2))
    cap = banded_plan_cap(x, 0.31, 23, w=8)
    # uniform torus coverage: cap near mean occupancy * slack
    from gpquad.ops.spread_banded import _geometry
    nf, bh, nbands = _geometry(23, 8)
    mean_occ = 10000 / nbands
    assert cap < 3 * mean_occ
    assert cap % 8 == 0


def test_wider_kernel_more_accurate(setup):
    x, v, f, op, mtot, h, cap = setup
    want = np.asarray(op.type1(v))
    e6 = np.abs(np.asarray(banded_nufft1_2d(
        x, v, h, mtot=mtot, w=6,
        cap=banded_plan_cap(np.asarray(x), h, mtot, w=6))) - want).max()
    e10 = np.abs(np.asarray(banded_nufft1_2d(
        x, v, h, mtot=mtot, w=10,
        cap=banded_plan_cap(np.asarray(x), h, mtot, w=10))) - want).max()
    assert e10 < e6
