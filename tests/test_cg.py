"""Batched masked-PCG tests (model: reference cg.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.cg import pcg


def _spd(rng, n, cond=50.0):
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    evals = np.geomspace(1.0, cond, n)
    return Q @ np.diag(evals) @ Q.T


def test_single_system(rng):
    n = 40
    A = _spd(rng, n)
    b = rng.normal(size=n)
    res = pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-10)
    assert np.allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-7)
    assert bool(res.converged)
    assert int(res.iters) <= 2 * n


def test_batched_systems(rng):
    n, B = 30, 5
    A = _spd(rng, n)
    Bmat = rng.normal(size=(B, n))
    Af = lambda V: V @ jnp.asarray(A).T
    res = pcg(Af, jnp.asarray(Bmat), tol=1e-10)
    want = np.linalg.solve(A, Bmat.T).T
    assert np.allclose(np.asarray(res.x), want, atol=1e-6)
    assert np.all(np.asarray(res.converged))


def test_complex_hermitian(rng):
    n = 25
    Z = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    A = Z @ Z.conj().T + 5 * np.eye(n)
    b = rng.normal(size=n) + 1j * rng.normal(size=n)
    res = pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-12)
    assert np.allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-8)


def test_preconditioner_reduces_iters(rng):
    n = 200
    diag = np.geomspace(1, 1e4, n)
    A = np.diag(diag) + 0.1 * _spd(rng, n, cond=2.0)
    b = rng.normal(size=n)
    Aop = lambda v: jnp.asarray(A) @ v
    res_plain = pcg(Aop, jnp.asarray(b), tol=1e-8, maxiter=3 * n)
    M_inv = lambda v: v / jnp.asarray(np.diag(A))
    res_prec = pcg(Aop, jnp.asarray(b), tol=1e-8, maxiter=3 * n, M_inv=M_inv)
    assert np.allclose(np.asarray(res_prec.x), np.linalg.solve(A, b), atol=1e-4)
    assert int(res_prec.iters) < int(res_plain.iters)


def test_warm_start_skips_work(rng):
    n = 50
    A = _spd(rng, n)
    b = rng.normal(size=n)
    xstar = np.linalg.solve(A, b)
    res = pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
              jnp.asarray(xstar), tol=1e-8)
    assert int(res.iters) == 0


def test_per_system_early_stopping(rng):
    """An easy system (rhs = eigvec) converges early; its lane must freeze
    bit-stable while hard lanes keep iterating."""
    n = 60
    A = _spd(rng, n, cond=1e4)
    evals, evecs = np.linalg.eigh(A)
    easy = evecs[:, -1]  # one CG iteration suffices
    hard = rng.normal(size=n)
    Bmat = jnp.asarray(np.stack([easy, hard]))
    Af = lambda V: V @ jnp.asarray(A).T
    res = pcg(Af, Bmat, tol=1e-9, maxiter=5 * n)
    want = np.linalg.solve(A, np.stack([easy, hard]).T).T
    assert np.allclose(np.asarray(res.x), want, rtol=1e-4, atol=1e-5)
    assert int(res.conv_iters[0]) < int(res.conv_iters[1])


def test_zero_rhs_absolute_fallback():
    n = 10
    A = np.eye(n)
    b = jnp.zeros((2, n))
    res = pcg(lambda V: V @ jnp.asarray(A).T, b, tol=1e-6)
    assert np.allclose(np.asarray(res.x), 0.0)
    assert np.all(np.asarray(res.converged))
    assert int(res.iters) == 0


def test_no_early_stopping_runs_maxiter(rng):
    n = 20
    A = _spd(rng, n)
    b = rng.normal(size=n)
    res = pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-6,
              maxiter=7, early_stopping=False)
    assert int(res.iters) == 7


def test_jit_compatible(rng):
    n = 30
    A = jnp.asarray(_spd(rng, n))
    b = jnp.asarray(rng.normal(size=(3, n)))

    @jax.jit
    def solve(bb):
        return pcg(lambda V: V @ A.T, bb, tol=1e-10).x

    assert np.allclose(np.asarray(solve(b)),
                       np.linalg.solve(np.asarray(A), np.asarray(b).T).T,
                       atol=1e-6)
