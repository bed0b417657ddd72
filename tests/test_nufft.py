"""NUFFT operator tests against the dense DFT oracle.

Model: reference test_nufft.py:13-153 (class vs legacy equivalence) and the
dense-F checks in verify_efgpnd_exact_small.py:66-81 — here the oracle is
the explicitly-formed design matrix F[n,k] = exp(+2 pi i x_n . xi_k).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.nufft import make_nufft


def dense_F(x, h, mtot, fft_order=False):
    """F[n, flat(k)] = exp(+2 pi i x_n . (h k)), k in [-m, m]^d."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    m = (mtot - 1) // 2
    if fft_order:
        k1 = np.concatenate([np.arange(0, m + 1), np.arange(-m, 0)])
    else:
        k1 = np.arange(-m, m + 1)
    grids = np.meshgrid(*([k1] * d), indexing="ij")
    K = np.stack(grids, axis=-1).reshape(-1, d)  # (M, d)
    return np.exp(2j * np.pi * (x @ (h * K.T)))  # (n, M)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_type1_matches_dense(rng, d):
    n, mtot, h = 50, 7, 0.31
    x = jnp.array(rng.uniform(-2, 2, size=(n, d)))
    c = jnp.array(rng.normal(size=n) + 1j * rng.normal(size=n))
    op = make_nufft(x, h, mtot)
    got = np.asarray(op.type1(c)).reshape(-1)
    F = dense_F(x, h, mtot)
    want = F.conj().T @ np.asarray(c)
    assert np.allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_type2_matches_dense(rng, d):
    n, mtot, h = 50, 7, 0.31
    x = jnp.array(rng.uniform(-2, 2, size=(n, d)))
    M = mtot**d
    f = jnp.array(rng.normal(size=M) + 1j * rng.normal(size=M))
    op = make_nufft(x, h, mtot)
    got = np.asarray(op.type2(f))
    F = dense_F(x, h, mtot)
    want = F @ np.asarray(f)
    assert np.allclose(got, want, rtol=1e-10, atol=1e-10)


def test_batched_applies(rng):
    n, mtot, h, d, B = 30, 5, 0.4, 2, 6
    x = jnp.array(rng.uniform(-1, 1, size=(n, d)))
    op = make_nufft(x, h, mtot)
    C = jnp.array(rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n)))
    got1 = np.asarray(op.type1(C))
    F = dense_F(x, h, mtot)
    for b in range(B):
        want = (F.conj().T @ np.asarray(C[b])).reshape(mtot, mtot)
        assert np.allclose(got1[b], want, atol=1e-10)
    Fk = jnp.array(rng.normal(size=(B, mtot**d)) + 1j * rng.normal(size=(B, mtot**d)))
    got2 = np.asarray(op.type2(Fk))
    for b in range(B):
        assert np.allclose(got2[b], F @ np.asarray(Fk[b]), atol=1e-10)
    # block-shaped batched type2
    got3 = np.asarray(op.type2(Fk.reshape(B, mtot, mtot)))
    assert np.allclose(got3, got2, atol=1e-12)


def test_fft_order_variant(rng):
    n, mtot, h = 20, 9, 0.17
    x = jnp.array(rng.uniform(-3, 3, size=(n, 2)))
    M = mtot**2
    f = jnp.array(rng.normal(size=M) + 1j * rng.normal(size=M))
    op = make_nufft(x, h, mtot, fft_order=True)
    got = np.asarray(op.type2(f))
    F = dense_F(x, h, mtot, fft_order=True)
    assert np.allclose(got, F @ np.asarray(f), atol=1e-10)


def test_adjoint_consistency(rng):
    """<F* c, f> == <c, F f> — type1 and type2 are true adjoints."""
    n, mtot, h, d = 40, 5, 0.23, 2
    x = jnp.array(rng.uniform(-1, 1, size=(n, d)))
    op = make_nufft(x, h, mtot)
    c = jnp.array(rng.normal(size=n) + 1j * rng.normal(size=n))
    f = jnp.array(rng.normal(size=mtot**d) + 1j * rng.normal(size=mtot**d))
    lhs = np.vdot(np.asarray(op.type1(c)).reshape(-1), np.asarray(f))
    rhs = np.vdot(np.asarray(c), np.asarray(op.type2(f)))
    assert np.allclose(lhs, rhs, rtol=1e-10)


def test_1d_input_shape(rng):
    x = jnp.array(rng.uniform(-1, 1, size=17))
    op = make_nufft(x, 0.3, 9)
    assert op.d == 1 and op.n == 17


def test_large_domain_phase_accuracy(rng):
    """Range reduction keeps phases accurate for large |x * h * k|."""
    n, mtot, h = 25, 21, 0.9
    x = jnp.array(rng.uniform(-500, 500, size=(n, 1)))
    c = jnp.array(rng.normal(size=n) + 1j * rng.normal(size=n))
    op = make_nufft(x, h, mtot)
    got = np.asarray(op.type1(c)).reshape(-1)
    want = dense_F(x, h, mtot).conj().T @ np.asarray(c)
    assert np.allclose(got, want, rtol=1e-8, atol=1e-8)
