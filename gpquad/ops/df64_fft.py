"""Double-word (df64) complex radix-2 FFT.

The matrix-free high-precision path needs the EFGP Gram matvec
``T x`` (FFT circular convolution, ops/toeplitz.py) at ~1e-13 relative
accuracy so iterative refinement converges to the f64-oracle posterior
mean at ANY grid size — the dense df64 operator of models/precision.py
stops at ``M <= DENSE_SOLVER_MAX_M``.  An f32 FFT leaves ~1e-7-relative
noise in the matvec, which caps refinement ~100x short of the 1e-6
agreement target; running the classic iterative radix-2
decimation-in-time butterflies in df64 arithmetic (ops/df64.py) with
host-f64 twiddles carries ~48 bits end to end.

The reference gets this for free from torch.fft in float64
(reference efgpnd.py:1368-1381); on f32-only TPU hardware this module is
the equivalent.  Sizes are static powers of two (trace-time plan:
bit-reversal permutation + per-stage twiddle tables baked as constants),
so XLA sees a fixed chain of gathers/elementwise ops it can fuse; the
work is VPU-bound and ~20x an f32 FFT's flops — still negligible next to
one CG solve.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .df64 import CDF, DF, cdf_mul, df_add, df_sub

__all__ = ["df_fft", "df_ifft", "df_fftn", "df_ifftn"]


def _bit_reversal(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _fft_plan(n: int, dtype_name: str):
    """Host-f64 plan: bit-reversal permutation + per-stage df64 twiddles
    ``w_k = exp(-i pi k / half)`` split into (hi, lo) words of ``dtype``."""
    if n & (n - 1) or n < 1:
        raise ValueError(f"df_fft needs a power-of-two size, got {n}")
    np_dtype = np.float32 if dtype_name == "float32" else np.float64
    perm = _bit_reversal(n)
    stages = []
    for s in range(n.bit_length() - 1):
        half = 1 << s
        ang = -np.pi * np.arange(half, dtype=np.float64) / half
        c64, s64 = np.cos(ang), np.sin(ang)

        def split(v):
            hi = v.astype(np_dtype)
            return hi, (v - hi.astype(np.float64)).astype(np_dtype)

        stages.append((split(c64), split(s64)))
    return perm, tuple(stages)


def _apply_last(x: CDF, *, inverse: bool) -> CDF:
    (re_hi, re_lo), (im_hi, im_lo) = x
    n = re_hi.shape[-1]
    if n == 1:
        return x
    perm, stages = _fft_plan(n, jnp.dtype(re_hi.dtype).name)
    perm = jnp.asarray(perm)
    parts = [a[..., perm] for a in (re_hi, re_lo, im_hi, im_lo)]
    lead = parts[0].shape[:-1]
    for (c_hi, c_lo), (s_hi, s_lo) in stages:
        half = c_hi.shape[0]
        shaped = [a.reshape(lead + (n // (2 * half), 2, half))
                  for a in parts]
        even = [a[..., 0, :] for a in shaped]
        odd = [a[..., 1, :] for a in shaped]
        sgn = 1.0 if not inverse else -1.0
        w = ((jnp.asarray(c_hi), jnp.asarray(c_lo)),
             (jnp.asarray(sgn * s_hi), jnp.asarray(sgn * s_lo)))
        t_re, t_im = cdf_mul(((odd[0], odd[1]), (odd[2], odd[3])), w)
        a_re = df_add((even[0], even[1]), t_re)
        a_im = df_add((even[2], even[3]), t_im)
        b_re = df_sub((even[0], even[1]), t_re)
        b_im = df_sub((even[2], even[3]), t_im)
        parts = [
            jnp.concatenate([a[..., None, :], b[..., None, :]], axis=-2)
            .reshape(lead + (n // (2 * half), 2 * half))
            for a, b in ((a_re[0], b_re[0]), (a_re[1], b_re[1]),
                         (a_im[0], b_im[0]), (a_im[1], b_im[1]))]
    parts = [a.reshape(lead + (n,)) for a in parts]
    if inverse:
        inv_n = 1.0 / n                       # exact power-of-two scaling
        parts = [a * inv_n for a in parts]
    return (parts[0], parts[1]), (parts[2], parts[3])


def df_fft(x: CDF, axis: int = -1) -> CDF:
    """Forward df64 FFT along ``axis`` (np.fft.fft sign convention)."""
    return _along_axis(x, axis, inverse=False)


def df_ifft(x: CDF, axis: int = -1) -> CDF:
    """Inverse df64 FFT along ``axis`` (np.fft.ifft, incl. 1/N)."""
    return _along_axis(x, axis, inverse=True)


def _along_axis(x: CDF, axis: int, *, inverse: bool) -> CDF:
    if axis in (-1, x[0][0].ndim - 1):
        return _apply_last(x, inverse=inverse)
    mv = lambda a: jnp.moveaxis(a, axis, -1)
    y = ((mv(x[0][0]), mv(x[0][1])), (mv(x[1][0]), mv(x[1][1])))
    y = _apply_last(y, inverse=inverse)
    bk = lambda a: jnp.moveaxis(a, -1, axis)
    return (bk(y[0][0]), bk(y[0][1])), (bk(y[1][0]), bk(y[1][1]))


def df_fftn(x: CDF, axes: Tuple[int, ...]) -> CDF:
    for ax in axes:
        x = _along_axis(x, ax, inverse=False)
    return x


def df_ifftn(x: CDF, axes: Tuple[int, ...]) -> CDF:
    for ax in axes:
        x = _along_axis(x, ax, inverse=True)
    return x
