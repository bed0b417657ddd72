"""Fused Pallas NUFFT kernel tests (interpreter mode on CPU; the same
kernels compile on TPU where they were validated against the f64 oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.nufft import make_nufft
from gpquad.ops.pallas_nufft import (_cos_sin_cycles, pallas_nufft1_2d,
                                     pallas_nufft2_2d)

from .test_nufft import dense_F


def test_polynomial_cos_sin():
    c = jnp.asarray(np.linspace(-0.5, 0.5, 10001))
    co, s = _cos_sin_cycles(c)
    assert np.max(np.abs(np.asarray(co) - np.cos(2 * np.pi * np.asarray(c)))) < 1e-7
    assert np.max(np.abs(np.asarray(s) - np.sin(2 * np.pi * np.asarray(c)))) < 1e-7


def test_pallas_type2_matches_dense(rng):
    n, mtot, h = 700, 9, 0.31
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(mtot, mtot))
                    + 1j * rng.normal(size=(mtot, mtot)), jnp.complex64)
    got = np.asarray(jnp.abs(pallas_nufft2_2d(x, f, h, mtot=mtot, tile=256)))
    F = dense_F(np.asarray(x), h, mtot)
    want = np.abs(F @ np.asarray(f).reshape(-1))
    assert np.max(np.abs(got - want)) < 2e-4 * want.max()


def test_pallas_type1_matches_dense(rng):
    n, mtot, h = 700, 9, 0.31
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n),
                    jnp.complex64)
    got = np.asarray(jnp.abs(pallas_nufft1_2d(x, v, h, mtot=mtot, tile=256)))
    F = dense_F(np.asarray(x), h, mtot)
    want = np.abs((F.conj().T @ np.asarray(v)).reshape(mtot, mtot))
    assert np.max(np.abs(got - want)) < 2e-4 * want.max()


def test_pallas_matches_mxu_path(rng):
    """Pallas and MXU paths implement the identical operator."""
    n, mtot, h = 1100, 7, 0.23
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    op = make_nufft(x, h, mtot)
    f = jnp.asarray(rng.normal(size=(mtot, mtot)), jnp.complex64)
    a = np.asarray(jnp.abs(pallas_nufft2_2d(x, f, h, mtot=mtot, tile=512)))
    b = np.asarray(jnp.abs(op.type2(f)))
    assert np.max(np.abs(a - b)) < 5e-5 * b.max()


def test_pallas_ragged_tile(rng):
    """n not divisible by the tile: padding rows must not contaminate."""
    n, mtot, h = 513, 5, 0.4
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    v = jnp.asarray(rng.normal(size=n), jnp.complex64)
    got = np.asarray(jnp.abs(pallas_nufft1_2d(x, v, h, mtot=mtot, tile=256)))
    F = dense_F(np.asarray(x), h, mtot)
    want = np.abs((F.conj().T @ np.asarray(v)).reshape(mtot, mtot))
    assert np.max(np.abs(got - want)) < 2e-4 * want.max()


def test_mode_tiled_kernels(rng):
    """mtot > _MODE_TILE dispatches the tiled kernels; results match."""
    from gpquad.ops.pallas_nufft import _MODE_TILE
    n, mtot, h = 600, _MODE_TILE + 45, 0.011
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    op = make_nufft(x, h, mtot)
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n),
                    jnp.complex64)
    got1 = pallas_nufft1_2d(x, v, h, mtot=mtot, tile=256)
    want1 = op.type1(v)
    assert float(jnp.max(jnp.abs(got1 - want1))
                 / jnp.max(jnp.abs(want1))) < 5e-5
    f = jnp.asarray(rng.normal(size=(mtot, mtot)), jnp.complex64)
    got2 = pallas_nufft2_2d(x, f, h, mtot=mtot, tile=256)
    want2 = op.type2(f)
    assert float(jnp.max(jnp.abs(got2 - want2))
                 / jnp.max(jnp.abs(want2))) < 5e-5
