"""df64 (double-word f32) arithmetic tests (ops/df64.py, ops/nufft_df.py).

Oracle: numpy f64 of the exactly-representable f32 inputs — the df64
pair must track it to ~1e-13, far below anything plain f32 can do.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.df64 import (df_add, df_mul, df_sincos_2pi, df_sum_tree,
                             two_prod, two_sum)
from gpquad.ops.nufft_df import df_nufft1, df_nufft2_real, split_f64_host


def _f64(a):
    return np.asarray(a, np.float64)


def _val(df):
    return _f64(df[0]) + _f64(df[1])


def test_two_prod_exact(rng):
    a = jnp.asarray(rng.uniform(-1, 1, 5000), jnp.float32)
    b = jnp.asarray(rng.uniform(-1e3, 1e3, 5000), jnp.float32)
    p, e = two_prod(a, b)
    np.testing.assert_array_equal(_f64(p) + _f64(e), _f64(a) * _f64(b))


def test_two_sum_exact(rng):
    a = jnp.asarray(rng.uniform(-1, 1, 5000), jnp.float32)
    b = jnp.asarray(rng.uniform(-1e4, 1e4, 5000), jnp.float32)
    s, e = two_sum(a, b)
    np.testing.assert_array_equal(_f64(s) + _f64(e), _f64(a) + _f64(b))


def test_df_mul_add(rng):
    a = jnp.asarray(rng.uniform(-1, 1, 5000), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, 5000), jnp.float32)
    c = jnp.asarray(rng.uniform(-1, 1, 5000), jnp.float32)
    x, y = two_prod(a, b), two_prod(b, c)
    z = _val(df_mul(x, y))
    ref = (_f64(a) * _f64(b)) * (_f64(b) * _f64(c))
    assert np.max(np.abs(z - ref) / np.maximum(np.abs(ref), 1e-30)) < 1e-13
    w = _val(df_add(x, y))
    assert np.max(np.abs(w - (_f64(a) * _f64(b) + _f64(b) * _f64(c)))) < 1e-13


def test_df_sum_tree_beats_f32(rng):
    v = jnp.asarray(rng.uniform(-1, 1, 100_001), jnp.float32)  # odd length
    got = _val(df_sum_tree((v, jnp.zeros_like(v))))
    ref = np.sum(_f64(v))
    assert abs(got - ref) < 1e-9
    assert abs(float(jnp.sum(v)) - ref) > 1e-7  # plain f32 random walk


def test_df_sincos_2pi(rng):
    c = jnp.asarray(rng.uniform(-0.5, 0.5, 50_000), jnp.float32)
    sin_df, cos_df = jax.jit(df_sincos_2pi)((c, jnp.zeros_like(c)))
    theta = 2 * np.pi * _f64(c)
    assert np.max(np.abs(_val(sin_df) - np.sin(theta))) < 1e-13
    assert np.max(np.abs(_val(cos_df) - np.cos(theta))) < 1e-13


@pytest.mark.parametrize("d", [1, 2])
def test_df_nufft1_vs_f64_oracle(rng, d):
    n, mtot, h = 3000, 9, 0.37
    x = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    hi, lo = df_nufft1(x, y, split_f64_host(h), mtot)
    got = (_f64(jnp.real(hi)) + _f64(jnp.real(lo))
           + 1j * (_f64(jnp.imag(hi)) + _f64(jnp.imag(lo))))
    m = (mtot - 1) // 2
    k1 = np.arange(-m, m + 1)
    K = (np.stack(np.meshgrid(*([k1] * d), indexing="ij"), -1).reshape(-1, d)
         if d > 1 else k1[:, None])
    F = np.exp(-2j * np.pi * (h * K) @ _f64(x).T)
    ref = F @ _f64(y)
    # the floor is per-term f32 product rounding inside the MXU einsums
    # (random, ~2^-24 of each term, one stage per dimension); phases and
    # accumulation are df64 so everything else sits far below it
    floor = 2 ** -24 * np.linalg.norm(_f64(y)) * d
    assert np.max(np.abs(got - ref)) < 5 * floor


@pytest.mark.parametrize("d", [1, 2])
def test_df_nufft2_real_vs_f64_oracle(rng, d):
    nt, mtot, h = 200, 9, 0.37
    M = mtot ** d
    x = jnp.asarray(rng.uniform(0, 1, (nt, d)), jnp.float32)
    cr = jnp.asarray(rng.normal(size=M), jnp.float32)
    ci = jnp.asarray(rng.normal(size=M), jnp.float32)
    hi, lo = df_nufft2_real(x, (cr, jnp.zeros_like(cr)),
                            (ci, jnp.zeros_like(ci)), split_f64_host(h),
                            mtot, slab=128)
    got = _f64(hi) + _f64(lo)
    m = (mtot - 1) // 2
    k1 = np.arange(-m, m + 1)
    K = (np.stack(np.meshgrid(*([k1] * d), indexing="ij"), -1).reshape(-1, d)
         if d > 1 else k1[:, None])
    F = np.exp(2j * np.pi * _f64(x) @ (h * K).T)
    ref = np.real(F @ (_f64(cr) + 1j * _f64(ci)))
    assert np.max(np.abs(got - ref)) < 1e-10 * np.max(np.abs(ref))


def test_df_sum_tree_axis_variants(rng):
    """In-place (no-moveaxis) reduction must match numpy f64 along every
    axis, including odd lengths and odd minor dims (the XLA:CPU layout
    pathology df_sum_tree is designed around)."""
    a = jnp.asarray(rng.uniform(-1, 1, (37, 13, 21)), jnp.float32)
    ref = _f64(a)
    for ax in (0, 1, 2, -1, -2):
        got = _val(df_sum_tree((a, jnp.zeros_like(a)), axis=ax))
        np.testing.assert_allclose(got, np.sum(ref, axis=ax), rtol=0,
                                   atol=1e-11)


def test_df_sum_tree_length_one_and_two(rng):
    a = jnp.asarray(rng.uniform(-1, 1, (1, 4)), jnp.float32)
    got = _val(df_sum_tree((a, jnp.zeros_like(a)), axis=0))
    np.testing.assert_allclose(got, _f64(a)[0], rtol=0, atol=0)
    b = jnp.asarray(rng.uniform(-1, 1, (2, 5)), jnp.float32)
    got = _val(df_sum_tree((b, jnp.zeros_like(b)), axis=0))
    np.testing.assert_allclose(got, _f64(b).sum(0), rtol=0, atol=1e-12)


def test_hard_materialize_identity(rng):
    """hard_materialize is numerically the identity (values pass through
    a data-dependent while_loop unchanged), eager and under jit."""
    from gpquad.ops.df64 import hard_materialize
    a = jnp.asarray(rng.uniform(-1, 1, (7, 13)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    oa, ob = hard_materialize((a, b))
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(b))
    oa, ob = jax.jit(lambda t: hard_materialize(t))((a, b))
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(b))
