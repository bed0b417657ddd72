"""Error-free bf16-digit MXU table builder (ops/ozaki.py).

Pins the three exactness layers the scheme stands on — digit
reconstruction, bf16 representability of every digit, exact f32
accumulation bounds — plus end-to-end ~1e-13 agreement with the
all-VPU compensated builder it replaces on the hot call sites.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpquad.ops.nufft_df import df_nufft1_exact, split_f64_host
from gpquad.ops.ozaki import _digits_unit, ozaki_nufft1


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _df_pair(a64):
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def test_digits_reconstruct_and_bf16_exact(rng):
    a64 = rng.uniform(-1, 1, 5000)
    hi, lo = _df_pair(a64)
    digs = jax.jit(lambda p: _digits_unit(p))((hi, lo))
    rec = sum(np.asarray(d, np.float64) for d in digs)
    # digits reconstruct the df VALUE (hi+lo) to the K*w = 54-bit
    # absolute truncation floor (a64 itself differs from hi+lo by the
    # df pair's own ~2^-49 representation error)
    dfval = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    assert np.max(np.abs(rec - dfval)) < 2 ** -53
    for d in digs:
        d64 = np.asarray(d, np.float64)
        # every digit is exactly bfloat16-representable
        assert np.array_equal(np.asarray(d.astype(jnp.bfloat16), np.float64),
                              d64)
        # and lies on its absolute grid with a <= 7-bit significand
    k1 = np.asarray(digs[0], np.float64) * 64
    assert np.array_equal(k1, np.round(k1))
    assert np.max(np.abs(k1)) <= 64


def _h_df(h):
    return tuple(jnp.asarray(v, jnp.float32) for v in split_f64_host(h))


@pytest.mark.parametrize("d,mtot,n", [(1, 29, 3000), (2, 21, 5000),
                                      (2, 57, 2000), (3, 9, 2000)])
def test_matches_compensated_builder(rng, d, mtot, n):
    x = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n) * 11.3, jnp.float32)
    h_df = _h_df(0.173)
    for vals in (None, y):
        pe = jax.jit(lambda xx, vv: df_nufft1_exact(
            xx, vv, h_df, mtot, method="compensated"))(x, vals)
        po = jax.jit(lambda xx, vv: ozaki_nufft1(xx, vv, h_df, mtot))(x, vals)
        Se = np.asarray(pe[0], np.complex128) + np.asarray(pe[1],
                                                           np.complex128)
        So = np.asarray(po[0], np.complex128) + np.asarray(po[1],
                                                           np.complex128)
        assert np.max(np.abs(Se - So)) < 1e-12 * np.max(np.abs(Se))


def test_auto_dispatch_and_guards(rng):
    n = 512
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    h_df = _h_df(0.21)
    # auto == ozaki for f32/real/d<=2
    pa = jax.jit(lambda: df_nufft1_exact(x, y, h_df, 9))()
    po = jax.jit(lambda: ozaki_nufft1(x, y, h_df, 9))()
    assert np.array_equal(np.asarray(jnp.real(pa[0])),
                          np.asarray(jnp.real(po[0])))
    with pytest.raises(NotImplementedError):
        ozaki_nufft1(jnp.zeros((8, 4), jnp.float32), None, h_df, 5)
    with pytest.raises(NotImplementedError):
        ozaki_nufft1(x, y.astype(jnp.complex64), h_df, 9)


def test_extreme_weight_scales(rng):
    """The power-of-two weight folding keeps exactness for large and tiny
    weights alike."""
    n = 700
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    h_df = _h_df(0.31)
    for s in (1e-6, 1.0, 3e4):
        y = jnp.asarray(rng.normal(size=n) * s, jnp.float32)
        pe = jax.jit(lambda: df_nufft1_exact(x, y, h_df, 11,
                                             method="compensated"))()
        po = jax.jit(lambda: ozaki_nufft1(x, y, h_df, 11))()
        Se = np.asarray(pe[0], np.complex128) + np.asarray(pe[1],
                                                           np.complex128)
        So = np.asarray(po[0], np.complex128) + np.asarray(po[1],
                                                           np.complex128)
        assert np.max(np.abs(Se - So)) < 1e-12 * np.max(np.abs(Se)), s
