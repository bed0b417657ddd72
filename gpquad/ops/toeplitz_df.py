"""df64 multilevel-Toeplitz (BTTB) matvec for the matrix-free
high-precision path.

Same circular-convolution algebra as ops/toeplitz.py (reference
ToeplitzND, efgpnd.py:1239-1393) but run end to end in double-word
arithmetic: the padded lag table's spectrum (the "symbol") is computed
once with the df64 FFT, and each matvec is pad -> df_fftn -> pointwise
cdf multiply -> df_ifftn -> central-block crop.  Matvec relative accuracy
is ~1e-13 (f32 pairs), which is what lets iterative refinement against
the f32 CG inner solver reach the f64-oracle posterior mean at grid sizes
where the dense df64 operator (models/precision.py) no longer fits.

Power-of-two FFT shapes only (the df64 FFT is radix-2).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .df64 import CDF, cdf_mul, df_add, df_mul_f
from .df64_fft import df_fftn, df_ifftn

__all__ = ["ToeplitzDF", "make_toeplitz_df", "toeplitz_df_matvec"]


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


class ToeplitzDF(NamedTuple):
    symbol: CDF                   # ((re_hi, re_lo), (im_hi, im_lo)), fft_shape
    ns: Tuple[int, ...]
    fft_shape: Tuple[int, ...]


def _pad_to(x: jnp.ndarray, shape: Tuple[int, ...], d: int) -> jnp.ndarray:
    pads = [(0, 0)] * (x.ndim - d) + [
        (0, s - n) for s, n in zip(shape, x.shape[-d:])]
    return jnp.pad(x, pads)


def make_toeplitz_df(v: CDF, d: int) -> ToeplitzDF:
    """Build the df64 operator from the df64 convolution vector ``v``
    shaped ``(2 n_1 - 1, ..., 2 n_d - 1)`` (trailing d axes; see
    ops/operators.convolution_vector and reference efgpnd.py:1395-1421)."""
    Ls = v[0][0].shape[-d:]
    ns = tuple((L + 1) // 2 for L in Ls)
    fft_shape = tuple(_next_pow2(L) for L in Ls)
    padded = tuple(tuple(_pad_to(w, fft_shape, d) for w in pair)
                   for pair in v)
    axes = tuple(range(-d, 0))
    symbol = df_fftn(padded, axes)
    return ToeplitzDF(symbol=symbol, ns=ns, fft_shape=fft_shape)


def toeplitz_df_matvec(T: ToeplitzDF, x: CDF) -> CDF:
    """Apply T to ``x`` with trailing flat (M,) layout (leading dims are
    batch); returns the df64 result in the same flat layout."""
    d = len(T.ns)
    size = 1
    for n in T.ns:
        size *= n
    batch = x[0][0].shape[:-1]
    xb = tuple(tuple(w.reshape(batch + T.ns) for w in pair) for pair in x)
    xb = tuple(tuple(_pad_to(w, T.fft_shape, d) for w in pair)
               for pair in xb)
    axes = tuple(range(-d, 0))
    xf = df_fftn(xb, axes)
    yf = cdf_mul(xf, T.symbol)
    y = df_ifftn(yf, axes)
    sl = tuple([slice(None)] * len(batch)
               + [slice(n - 1, 2 * n - 1) for n in T.ns])
    return tuple(tuple(w[sl].reshape(batch + (size,)) for w in pair)
                 for pair in y)
