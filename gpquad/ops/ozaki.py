"""Error-free MXU table builder (Ozaki-style digit-split matmul).

The df64 NUFFT table builds (ops/nufft_df.df_nufft1_exact) run every
product and point-axis sum in double-word VPU arithmetic — ~1e-13
tables, but all VPU: 2.3 s for the (213,)^2 lag table at n=1e5 on v5e,
the dominant cost of every high-precision estimator at large grids.

TPU-first observation (the Ozaki error-free-transformation scheme,
adapted to df64 phase factors): every factor in the table sum

    S[k1, k2] = sum_j w_j E1[j, k1] E2[j, k2],   |E| <= 1

can be split into ``K`` six-bit absolute-grid digits

    a = sum_i d_i,   d_i = a rounded to grid 2^(-6i)  (d_i exact f32)

where each digit value has a <= 7-bit significand and is therefore
EXACTLY representable in bfloat16.  A bf16 x bf16 -> f32 MXU matmul of
digit blocks is then error-free end to end: each product has a <= 14-bit
significand (exact f32) on grid 2^(-6(i+j)), and a 1024-point
accumulation grows it by <= 10 bits (24 < f32's exact-integer window).
So the whole table reduces to ONE full-rate bf16 matmul per point chunk
(all K x K digit pairs at once as a (K L1) x (K L2) block), with df64
recombination of the exact per-chunk blocks.  Truncating factors at
K*6 = 54 bits bounds the error by ``n * 2^F * 2^-54`` absolute — at or
below the compensated builder's own ~1e-13 floor — while moving ~all
the work from the VPU to the MXU.

Weights fold into the second factor scaled by the power of two
``2^F >= max|w|`` (exact), so the unit-interval digit algebra applies
unchanged.  For d = 3 the second factor is the df64 OUTER PRODUCT of
dims 1..2 (per-dim mode counts are small in 3-D, so the (c, mtot^2) row
factor is cheap) — the digit matmul then contracts dim 0 against it
exactly as in 2-D.  Real weights only (every table call site passes
real ``y`` or ones).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .df64 import df_add, df_mul, df_mul_f, df_sum_tree, two_sum
from .nufft_df import _pad_pow2_chunks, cdf_outer_rows, df_phase_factors

__all__ = ["ozaki_nufft1"]

_W = 6            # digit width (bits): 7-bit values -> bf16-exact
_K = 9            # digits per factor: 54 bits of absolute significance
_CHUNK = 1024     # 14-bit products + 10-bit growth = 24 -> exact f32


def _digits_unit(df_pair, K: int = _K, w: int = _W):
    """Split df64 values in [-1, 1] into ``K`` exact ``w``-bit digits.

    Digit ``i`` is the remainder rounded to the absolute grid
    ``2^(-w i)`` via explicit ``round(r * 2^(w i)) / 2^(w i)`` — every
    step an exact power-of-two scale or an exact small integer.  (The
    classic Dekker/Rump ``(r + sigma) - sigma`` trick is UNSAFE under
    XLA: the algebraic simplifier folds the add/sub pair away and
    returns ``r`` verbatim — measured, not hypothetical.)  The running
    remainder stays a df pair so the low word's bits surface once the
    high word is exhausted.
    """
    r_hi, r_lo = df_pair
    out = []
    for i in range(1, K + 1):
        s = jnp.asarray(2.0 ** (w * i), r_hi.dtype)
        d = jnp.round(r_hi * s) / s
        nh = r_hi - d                       # exact: d on r_hi's grid
        nh, nl = two_sum(nh, r_lo)
        r_hi, r_lo = nh, nl
        out.append(d)
    return out


def _digit_block(df_pair, K: int = _K):
    """(c, L) df pair -> (c, K*L) bf16 digit block (exact conversion)."""
    return jnp.concatenate(
        [d.astype(jnp.bfloat16) for d in _digits_unit(df_pair, K)], axis=1)


def _exact_dot(A: jnp.ndarray, B: jnp.ndarray, L1: int, L2: int,
               K: int = _K) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Error-free (K*L1, K*L2) bf16 MXU matmul over the chunk axis,
    block-reduced to an (L1*L2,) df pair."""
    C = lax.dot_general(A, B, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    # (K, L1, K, L2) -> (K*K, L1*L2) exact blocks, df64 tree-reduce
    C = C.reshape(K, L1, K, L2).transpose(0, 2, 1, 3).reshape(K * K,
                                                              L1 * L2)
    return df_sum_tree((C, jnp.zeros_like(C)), axis=0)


def ozaki_nufft1(x: jnp.ndarray, vals: Optional[jnp.ndarray], h_df,
                 mtot: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``df_nufft1_exact`` (real or unit weights, d <= 2):
    type-1 ``S[k] = sum_j w_j e^(-2 pi i x_j . h k)`` as a flat complex
    (hi, lo) pair, built with error-free bf16 MXU matmuls."""
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    if d > 3:
        raise NotImplementedError("ozaki_nufft1 supports d <= 3")
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    if vals is not None and jnp.iscomplexobj(vals):
        raise NotImplementedError("ozaki_nufft1 supports real weights")

    w = (jnp.ones((n,), rdtype) if vals is None
         else vals.astype(rdtype))
    # exact power-of-two scale so |w / 2^F| <= 1.  ldexp, NOT exp2:
    # jnp.exp2 is a polynomial approximation and returns 2^e off by an
    # ulp at larger |e|, silently breaking every "exact power-of-two"
    # step downstream (measured: 1.7e-8 relative at |e| ~ 15).
    wmax = jnp.max(jnp.abs(w))
    _, e = jnp.frexp(jnp.maximum(wmax, jnp.asarray(1e-30, rdtype)))
    scale = jnp.ldexp(jnp.asarray(1.0, rdtype), e)  # 2^F >= wmax, exact
    w_unit = w / scale                              # exact (power of two)

    npad = _pad_pow2_chunks(n, _CHUNK)
    if npad != n:
        x = jnp.concatenate([x, jnp.zeros((npad - n, d), rdtype)], axis=0)
        w_unit = jnp.concatenate([w_unit, jnp.zeros((npad - n,), rdtype)],
                                 axis=0)
    nc = npad // _CHUNK

    def body(acc, args):
        xc, wc = args
        _, c1, s1 = df_phase_factors(xc[:, 0], h_df, mtot, isign=-1)
        wpair = (wc[:, None], jnp.zeros_like(wc)[:, None])
        if d == 1:
            # fold w into the (single) factor; unit first factor
            one = jnp.ones((xc.shape[0], 1), rdtype)
            P = jnp.concatenate(
                [one.astype(jnp.bfloat16)]
                + [jnp.zeros_like(one, jnp.bfloat16)] * (_K - 1), axis=1)
            L1, L2 = 1, mtot
            a2 = _digit_block(df_mul(wpair, c1))
            b2 = _digit_block(df_mul(wpair, s1))
            re = _exact_dot(P, a2, L1, L2)
            im = _exact_dot(P, b2, L1, L2)
        else:
            # fold w and dims 1..d-1 into one df64 row factor (|.| <= 1)
            rows_re, rows_im = None, None
            for dim in range(1, d):
                _, ct, st = df_phase_factors(xc[:, dim], h_df, mtot,
                                             isign=-1)
                if rows_re is None:
                    rows_re, rows_im = ct, st
                else:
                    rows_re, rows_im = cdf_outer_rows(rows_re, rows_im,
                                                      ct, st)
            L1, L2 = mtot, mtot ** (d - 1)
            A1, B1 = _digit_block(c1), _digit_block(s1)
            A2 = _digit_block(df_mul(wpair, rows_re))
            B2 = _digit_block(df_mul(wpair, rows_im))
            # (a1 + i b1)(a2 + i b2) summed with real w folded into 2
            bb = _exact_dot(B1, B2, L1, L2)
            re = df_add(_exact_dot(A1, A2, L1, L2), (-bb[0], -bb[1]))
            im = df_add(_exact_dot(A1, B2, L1, L2),
                        _exact_dot(B1, A2, L1, L2))
        return (df_add(acc[0], re), df_add(acc[1], im)), None

    M = mtot ** d
    zero = jnp.zeros((M,), rdtype)
    (re, im), _ = lax.scan(
        body, ((zero, zero), (zero, zero)),
        (x.reshape(nc, _CHUNK, d), w_unit.reshape(nc, _CHUNK)))
    re = df_mul_f(re, scale)
    im = df_mul_f(im, scale)
    hi = lax.complex(re[0], im[0]).astype(cdtype)
    lo = lax.complex(re[1], im[1]).astype(cdtype)
    return hi, lo
