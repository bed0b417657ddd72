"""Direct oracle tests for the df64 radix-2 FFT (ops/df64_fft.py) and the
df64 multilevel-Toeplitz matvec (ops/toeplitz_df.py).

These back the matrix-free high-precision path (models/precision.py
iterative branch, models/variance_high.py, parallel/msharded.py); until
now they were only covered end-to-end.  Oracle: numpy f64/complex128 of
exactly-representable f32 inputs — the df64 (hi, lo) pairs must track it
orders of magnitude below plain f32.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.df64_fft import df_fft, df_fftn, df_ifft
from gpquad.ops.toeplitz_df import make_toeplitz_df, toeplitz_df_matvec


def _cdf_from_f32(z32):
    """Complex f32 ndarray -> ((re_hi, re_lo), (im_hi, im_lo)) with zero
    low words (the f32 values are exact as df64)."""
    re = jnp.asarray(z32.real.astype(np.float32))
    im = jnp.asarray(z32.imag.astype(np.float32))
    return (re, jnp.zeros_like(re)), (im, jnp.zeros_like(im))


def _cdf_val(c):
    return ((np.asarray(c[0][0], np.float64) + np.asarray(c[0][1], np.float64))
            + 1j * (np.asarray(c[1][0], np.float64)
                    + np.asarray(c[1][1], np.float64)))


def test_df_fft_matches_numpy_f64(rng):
    z = (rng.normal(size=128) + 1j * rng.normal(size=128)).astype(np.complex64)
    got = _cdf_val(df_fft(_cdf_from_f32(z)))
    ref = np.fft.fft(z.astype(np.complex128))
    err = np.max(np.abs(got - ref))
    assert err < 1e-11
    # plain f32 FFT cannot reach that floor on the same data
    f32 = np.max(np.abs(np.fft.fft(z).astype(np.complex128) - ref))
    assert f32 > 10 * err


def test_df_fft_ifft_roundtrip(rng):
    z = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
    back = _cdf_val(df_ifft(df_fft(_cdf_from_f32(z))))
    np.testing.assert_allclose(back, z.astype(np.complex128), rtol=0,
                               atol=1e-12)


def test_df_fftn_axes_match_numpy(rng):
    z = (rng.normal(size=(8, 16)) + 1j * rng.normal(size=(8, 16))
         ).astype(np.complex64)
    got = _cdf_val(df_fftn(_cdf_from_f32(z), axes=(-2, -1)))
    ref = np.fft.fftn(z.astype(np.complex128))
    assert np.max(np.abs(got - ref)) < 1e-10


@pytest.mark.parametrize("d", [1, 2])
def test_toeplitz_df_matvec_matches_dense_f64(rng, d):
    """T x from the df64 circulant embedding vs the explicitly-formed
    dense multilevel-Toeplitz matrix in f64 (same construction as
    ops/toeplitz.py's f32 operator; reference efgpnd.py:1395-1421)."""
    ns = (7,) if d == 1 else (5, 7)
    lag_shape = tuple(2 * n - 1 for n in ns)
    v = (rng.normal(size=lag_shape)
         + 1j * rng.normal(size=lag_shape)).astype(np.complex64)
    T = make_toeplitz_df(_cdf_from_f32(v), d)
    M = int(np.prod(ns))
    x = (rng.normal(size=M) + 1j * rng.normal(size=M)).astype(np.complex64)
    got = _cdf_val(toeplitz_df_matvec(T, _cdf_from_f32(x)))

    # dense oracle: T[j, k] = v[j - k + n - 1] per dimension
    v64 = v.astype(np.complex128)
    grids = np.meshgrid(*[np.arange(n) for n in ns], indexing="ij")
    J = np.stack([g.ravel() for g in grids], axis=1)      # (M, d)
    diff = J[:, None, :] - J[None, :, :] + (np.asarray(ns) - 1)
    dense = v64[tuple(diff[..., k] for k in range(d))]
    ref = dense @ x.astype(np.complex128)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-10


def test_toeplitz_df_matvec_batched(rng):
    ns = (5, 5)
    lag_shape = tuple(2 * n - 1 for n in ns)
    v = (rng.normal(size=lag_shape)
         + 1j * rng.normal(size=lag_shape)).astype(np.complex64)
    T = make_toeplitz_df(_cdf_from_f32(v), 2)
    M = int(np.prod(ns))
    X = (rng.normal(size=(3, M)) + 1j * rng.normal(size=(3, M))
         ).astype(np.complex64)
    got = _cdf_val(toeplitz_df_matvec(T, _cdf_from_f32(X)))
    for b in range(3):
        one = _cdf_val(toeplitz_df_matvec(T, _cdf_from_f32(X[b])))
        np.testing.assert_allclose(got[b], one, rtol=0, atol=1e-12)
