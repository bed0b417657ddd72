"""Toeplitz/BTTB operator tests.

Model: reference test_toeplitz_dims.py and the F*F checks in
MainSanityChecks/efgpnd_sanity_checks.ipynb — the oracle is the dense Gram
matrix F^H F of the explicitly-formed design.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.operators import convolution_vector
from gpquad.ops.toeplitz import make_toeplitz, toeplitz_diag_scale

from .test_nufft import dense_F


@pytest.mark.parametrize("d", [1, 2, 3])
def test_gram_matvec_matches_dense(rng, d):
    n, mtot, h = 40, 5, 0.29
    x = jnp.array(rng.uniform(-1.5, 1.5, size=(n, d)))
    m = (mtot - 1) // 2
    v = convolution_vector(m, x, h)
    assert v.shape == (4 * m + 1,) * d
    T = make_toeplitz(v)
    M = mtot**d
    F = dense_F(x, h, mtot)
    G = F.conj().T @ F  # (M, M)
    vec = jnp.array(rng.normal(size=M) + 1j * rng.normal(size=M))
    got = np.asarray(T(vec))
    assert np.allclose(got, G @ np.asarray(vec), rtol=1e-9, atol=1e-9)


def test_batched_and_block_layouts(rng):
    n, mtot, h, d, B = 30, 5, 0.41, 2, 4
    x = jnp.array(rng.uniform(-1, 1, size=(n, d)))
    m = (mtot - 1) // 2
    T = make_toeplitz(convolution_vector(m, x, h))
    M = mtot**d
    V = jnp.array(rng.normal(size=(B, M)) + 1j * rng.normal(size=(B, M)))
    flat = np.asarray(T(V))
    block = np.asarray(T(V.reshape(B, mtot, mtot)))
    assert flat.shape == (B, M)
    assert block.shape == (B, mtot, mtot)
    assert np.allclose(flat, block.reshape(B, M), atol=1e-12)
    F = dense_F(x, h, mtot)
    G = F.conj().T @ F
    for b in range(B):
        assert np.allclose(flat[b], G @ np.asarray(V[b]), atol=1e-9)


def test_diag_scale_equals_n(rng):
    n, mtot, h = 23, 7, 0.3
    x = jnp.array(rng.uniform(-1, 1, size=(n, 2)))
    v = convolution_vector((mtot - 1) // 2, x, h)
    assert np.allclose(float(toeplitz_diag_scale(v)), n, atol=1e-8)


def test_smooth_fft_sizes(rng):
    n, mtot, h = 10, 7, 0.3
    x = jnp.array(rng.uniform(-1, 1, size=(n, 1)))
    v = convolution_vector((mtot - 1) // 2, x, h)
    Tp = make_toeplitz(v, force_pow2=True)
    Ts = make_toeplitz(v, force_pow2=False)
    vec = jnp.array(rng.normal(size=mtot) + 1j * rng.normal(size=mtot))
    assert np.allclose(np.asarray(Tp(vec)), np.asarray(Ts(vec)), atol=1e-10)
    assert Tp.fft_shape[0] >= 4 * ((mtot - 1) // 2) + 1
