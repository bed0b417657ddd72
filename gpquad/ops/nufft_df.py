"""Double-word (df64) accurate NUFFT applies for the high-precision path.

The f32 MXU NUFFT (ops/nufft.py) lands at ~2e-7 relative accuracy — the
compound of per-term f32 product rounding and the matmul accumulator's
random walk.  For the eps=1e-6 agreement target the right-hand side
``D F* y``, the Toeplitz lag table, and the posterior-mean evaluation all
need ~1e-9 relative accuracy.  Recipe (d <= 2):

- **Phases to df64**: ``t = x h`` and ``t k`` via error-free two-products,
  folded onto the unit torus exactly, then ``sin/cos(2 pi c)`` by the df64
  polynomial (ops/df64.df_sincos_2pi, ~6e-15 absolute).  The phase matrix
  is carried as a (hi, lo) complex64 pair.
- **Type-1 on the MXU**: expand ``(E1_hi + E1_lo) v (E2_hi + E2_lo)`` —
  the hi*hi term is chunked into 64-point partial matmuls
  (``precision=HIGHEST``) reduced with the compensated pairwise df64 tree,
  which caps the accumulator random walk at the chunk scale; the
  2^-24-scale cross terms accumulate in plain f32 (their rounding is
  2^-48-scale).  Per-term product rounding remains (random, ~6e-8 of each
  term) but averages to ~1e-9..1e-8 of the output across n >= 1e4 points.
- **Type-2 on the VPU**: target counts are small, so the mode contraction
  runs fully elementwise in df64 (exact two-products + pairwise reduce),
  slabbed over targets to bound memory.

Conventions match ops/nufft.py (FINUFFT modeord=False, type1 isign=-1,
type2 isign=+1; reference efgpnd.py:1496-1548).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .df64 import (df_add, df_mul, df_sincos_2pi, df_sub, df_sum_tree,
                   hard_materialize, quick_two_sum, two_prod, two_sum)

__all__ = ["df_phase_factors", "df_nufft1", "df_nufft1_exact",
           "df_nufft2_real", "cdf_outer_rows", "split_f64_host"]

_HI = lax.Precision.HIGHEST


def split_f64_host(value, dtype=jnp.float32):
    """Split host f64 scalars/arrays into a (hi, lo) pair of ``dtype``
    (only REAL arrays cross the axon host boundary)."""
    import numpy as np
    v = np.asarray(value, np.float64)
    hi = v.astype(np.dtype(jnp.dtype(dtype).name))
    lo = (v - hi.astype(np.float64)).astype(hi.dtype)
    return jnp.asarray(hi), jnp.asarray(lo)


def _df_cycles(x_dim: jnp.ndarray, h_df, k: jnp.ndarray):
    """cycles = (x * h * k) mod 1 as a df64 pair, shape (n, mtot).

    ``x`` and ``k`` are exact f32; ``h`` is a df64 pair of the planner's
    f64 spacing, so the frequency grid matches the f64 oracle's bit-level.
    """
    th, e1 = two_prod(x_dim, h_df[0])
    tl = e1 + x_dim * h_df[1]
    th, tl = quick_two_sum(th, tl)
    # fold t onto the torus before multiplying by k (keeps |p| small)
    r = jnp.round(th)
    th = th - r                                   # exact (Sterbenz)
    p, e2 = two_prod(th[:, None], k[None, :])
    plo = e2 + tl[:, None] * k[None, :]
    c = p - jnp.round(p)                          # exact
    c, cl = two_sum(c, plo)
    # one more fold in case c + plo crossed +-0.5
    r = jnp.round(c)
    return c - r, cl


def df_phase_factors(x_dim: jnp.ndarray, h_df, mtot: int, *, isign: int):
    """Per-dimension df64 phase matrix ``exp(isign * 2 pi i x h k)`` as a
    (hi, lo) complex pair, plus the raw (cos, sin) df pairs."""
    rdtype = x_dim.dtype
    m = (mtot - 1) // 2
    k = jnp.arange(-m, m + 1, dtype=rdtype)
    c = _df_cycles(x_dim, h_df, k)
    sin_df, cos_df = df_sincos_2pi(c)
    s = float(isign)
    E_hi = lax.complex(cos_df[0], s * sin_df[0])
    E_lo = lax.complex(cos_df[1], s * sin_df[1])
    return (E_hi, E_lo), cos_df, (s * sin_df[0], s * sin_df[1])


def _pad_pow2_chunks(n: int, chunk: int) -> int:
    nc = -(-n // chunk)
    return nc * chunk


def df_nufft1(x: jnp.ndarray, vals: jnp.ndarray, h_df, mtot: int, *,
              chunk: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """df64-accurate type-1 (adjoint) apply ``F* vals`` on the symmetric
    mode grid; returns a flat (mtot^d,) complex64 (hi, lo) pair.  d <= 2.
    """
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    if d > 3:
        raise NotImplementedError(
            "df64 NUFFT supports d <= 3 (high-precision path)")
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    npad = _pad_pow2_chunks(n, chunk)
    if npad != n:
        x = jnp.concatenate([x, jnp.zeros((npad - n, d), rdtype)], axis=0)
        vals = jnp.concatenate(
            [vals, jnp.zeros((npad - n,), vals.dtype)], axis=0)
    v = vals.astype(cdtype)
    nc = npad // chunk

    (E1_hi, E1_lo), _, _ = df_phase_factors(x[:, 0], h_df, mtot, isign=-1)
    if d == 1:
        main = jnp.einsum("cn,cnj->cj", v.reshape(nc, chunk),
                          E1_hi.reshape(nc, chunk, mtot), precision=_HI)
        cross = jnp.einsum("cn,cnj->cj", v.reshape(nc, chunk),
                           E1_lo.reshape(nc, chunk, mtot), precision=_HI)
        hi, lo = df_sum_tree((main, jnp.zeros_like(main)), axis=0)
        return df_add((hi, lo), (jnp.sum(cross, axis=0),
                                 jnp.zeros_like(hi)))

    (E2_hi, E2_lo), _, _ = df_phase_factors(x[:, 1], h_df, mtot, isign=-1)
    if d == 2:
        w_hi = (E1_hi * v[:, None]).reshape(nc, chunk, mtot)
        w_lo = (E1_lo * v[:, None]).reshape(nc, chunk, mtot)
        e2_hi = E2_hi.reshape(nc, chunk, mtot)
        e2_lo = E2_lo.reshape(nc, chunk, mtot)
        main = jnp.einsum("cnj,cnk->cjk", w_hi, e2_hi, precision=_HI)
        cross = (jnp.einsum("cnj,cnk->cjk", w_hi, e2_lo, precision=_HI)
                 + jnp.einsum("cnj,cnk->cjk", w_lo, e2_hi, precision=_HI))
        hi, lo = df_sum_tree((main, jnp.zeros_like(main)), axis=0)
        out = df_add((hi, lo), (jnp.sum(cross, axis=0), jnp.zeros_like(hi)))
        return out[0].reshape(-1), out[1].reshape(-1)

    # d == 3: per j1 mode column, run the d=2 contraction over dims 2-3
    # (sequential lax.map bounds memory at O(npad * mtot); the lo*lo
    # double-cross terms are 2^-48-scale and dropped like the d=2 path)
    (E3_hi, E3_lo), _, _ = df_phase_factors(x[:, 2], h_df, mtot, isign=-1)
    e3_hi = E3_hi.reshape(nc, chunk, mtot)
    e3_lo = E3_lo.reshape(nc, chunk, mtot)

    def per_j(cols):
        e1c_hi, e1c_lo = cols               # (npad,) each
        v1_hi = e1c_hi * v
        v1_lo = e1c_lo * v
        w_hi = (E2_hi * v1_hi[:, None]).reshape(nc, chunk, mtot)
        w_lo = (E2_lo * v1_hi[:, None]
                + E2_hi * v1_lo[:, None]).reshape(nc, chunk, mtot)
        main = jnp.einsum("cnk,cnl->ckl", w_hi, e3_hi, precision=_HI)
        cross = (jnp.einsum("cnk,cnl->ckl", w_hi, e3_lo, precision=_HI)
                 + jnp.einsum("cnk,cnl->ckl", w_lo, e3_hi, precision=_HI))
        hi, lo = df_sum_tree((main, jnp.zeros_like(main)), axis=0)
        return df_add((hi, lo), (jnp.sum(cross, axis=0),
                                 jnp.zeros_like(hi)))

    hi, lo = lax.map(per_j, (E1_hi.T, E1_lo.T))      # (mtot, mtot, mtot)
    return hi.reshape(-1), lo.reshape(-1)


def cdf_outer_rows(r1, i1, r2, i2):
    """Tensor product of per-dimension phase rows: ``(s, a) x (s, b) ->
    (s, a*b)`` complex df64 pairs ((re, im), each a (hi, lo) tuple)."""
    s = r1[0].shape[0]

    def up(p, axis):
        idx = (slice(None), slice(None), None) if axis == 2 else (
            slice(None), None, slice(None))
        return (p[0][idx], p[1][idx])

    a1, b1 = up(r1, 2), up(i1, 2)
    a2, b2 = up(r2, 1), up(i2, 1)
    re = df_sub(df_mul(a1, a2), df_mul(b1, b2))
    im = df_add(df_mul(a1, b2), df_mul(b1, a2))
    return (tuple(w.reshape(s, -1) for w in re),
            tuple(w.reshape(s, -1) for w in im))


def exact_chunk(mtot: int, d: int) -> int:
    """Memory-aware point-chunk for :func:`df_nufft1_exact`: the scan body
    materializes ~8 (chunk, mtot^d) word arrays, so bound them to ~64 MB;
    large chunks matter because each scan step costs ~40 us of TPU
    sequencing overhead (3000 steps at chunk=64 added 125 ms to the
    headline fit)."""
    M = mtot ** d
    c = (64 << 20) // max(1, M * 32)
    c = max(64, min(2048, c))
    return 1 << (c.bit_length() - 1)          # floor to a power of two


def df_nufft1_exact(x: jnp.ndarray, vals, h_df, mtot: int, *,
                    chunk: int = 0,
                    method: str = "auto"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully-df64 type-1 (isign=-1): no f32 MXU accumulation anywhere.

    :func:`df_nufft1` reduces each 64-point chunk with a plain f32 matmul
    and only combines the chunk partials in df64 — the in-chunk random
    walk leaves the output at ~1e-8..1e-9 relative, which the posterior-
    variance quadratic form amplifies through ``A^{-1}`` past the 1e-6
    target (models/variance_high.py).  Exact builds keep the error at the
    ~1e-14 df64 roundoff random walk (measured ~1e-13 on the lag-table
    build), used for one-time tables, not per-iteration applies.

    ``method``: 'auto' (default) uses the error-free bf16-digit MXU
    builder (:func:`gpquad.ops.ozaki.ozaki_nufft1`, ~1e-14, 18x faster
    at the (213,)^2 lag table on v5e and ~11x on XLA:CPU) whenever it
    applies — ``d <= 3``, real/unit weights, f32 words — and the
    all-VPU compensated builder otherwise.  'compensated' / 'ozaki'
    force a branch.

    ``vals`` may be None (unit strengths — the Gram lag table), real, or
    complex; returns the same flat complex (hi, lo) pair as
    :func:`df_nufft1`.  ``chunk=0`` (default) picks the memory-aware
    size from :func:`exact_chunk` (compensated branch only).
    """
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    if d > 3:
        raise NotImplementedError("df64 NUFFT supports d <= 3")
    eligible = (d <= 3 and x.dtype == jnp.float32
                and (vals is None or not jnp.iscomplexobj(vals)))
    if method == "ozaki" or (method == "auto" and eligible):
        from .ozaki import ozaki_nufft1
        return ozaki_nufft1(x, vals, h_df, mtot)
    if chunk <= 0:
        chunk = exact_chunk(mtot, d)
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    npad = _pad_pow2_chunks(n, chunk)
    if vals is None:
        vr = jnp.ones((n,), rdtype)
        vi = jnp.zeros((n,), rdtype)
    else:
        vr = jnp.real(vals).astype(rdtype)
        vi = (jnp.imag(vals).astype(rdtype)
              if jnp.iscomplexobj(vals) else jnp.zeros((n,), rdtype))
    if npad != n:
        pad = ((0, npad - n),)
        x = jnp.pad(x, pad + ((0, 0),))
        vr, vi = jnp.pad(vr, pad), jnp.pad(vi, pad)
    nc = npad // chunk
    # the mode axis is padded to EVEN per dim: XLA:CPU/LLVM compiles
    # two_sum/two_prod chains with an odd minor (vectorized) dim ~400x
    # slower (see df64.df_sum_tree), and mtot is always odd here — all
    # df arithmetic below runs at mp per dim, sliced back at the end
    mp = mtot + (mtot % 2)
    M = mp ** d

    def pad_dim(p):
        if mp == mtot:
            return p
        return tuple(jnp.pad(w, ((0, 0), (0, 1))) for w in p)

    def body(acc, args):
        xc, vrc, vic = args
        rows_re, rows_im = None, None
        for dim in range(d):
            _, cos_df, sin_df = df_phase_factors(xc[:, dim], h_df, mtot,
                                                 isign=-1)
            cos_df, sin_df = pad_dim(cos_df), pad_dim(sin_df)
            if rows_re is None:
                rows_re, rows_im = cos_df, sin_df
            else:
                rows_re, rows_im = cdf_outer_rows(rows_re, rows_im,
                                                  cos_df, sin_df)
        # (a + b i)(c + d i) with plain (vrc, vic): products via two_prod
        def mul_plain(p, s):
            h, e = two_prod(p[0], s)
            return quick_two_sum(h, e + p[1] * s)

        vrb, vib = vrc[:, None], vic[:, None]
        pr = df_sub(mul_plain(rows_re, vrb), mul_plain(rows_im, vib))
        pi = df_add(mul_plain(rows_re, vib), mul_plain(rows_im, vrb))
        sr = df_sum_tree(pr, axis=0)
        si = df_sum_tree(pi, axis=0)
        return (df_add(acc[0], sr), df_add(acc[1], si)), None

    zero = jnp.zeros((M,), rdtype)
    acc0 = ((zero, zero), (zero, zero))
    (re, im), _ = lax.scan(
        body, acc0, (x.reshape(nc, chunk, d), vr.reshape(nc, chunk),
                     vi.reshape(nc, chunk)))
    if mp != mtot:
        sl = tuple([slice(0, mtot)] * d)
        re = tuple(w.reshape((mp,) * d)[sl].reshape(-1) for w in re)
        im = tuple(w.reshape((mp,) * d)[sl].reshape(-1) for w in im)
    hi = lax.complex(re[0], im[0]).astype(cdtype)
    lo = lax.complex(re[1], im[1]).astype(cdtype)
    return hi, lo


def _cdf_mul(xr, xi, yr, yi):
    """Complex df64 product on (re, im) df pairs."""
    re = df_sub(df_mul(xr, yr), df_mul(xi, yi))
    im = df_add(df_mul(xr, yi), df_mul(xi, yr))
    return re, im


def df_nufft2_real(x_new: jnp.ndarray, c_re, c_im, h_df, mtot: int, *,
                   slab: int = 2048) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """df64-accurate real part of the type-2 apply ``Re(F c)`` at targets.

    ``c_re``/``c_im``: df64 pairs of the (mtot,)*d mode coefficients.
    Fully elementwise df64 (exact products), slabbed over targets. d <= 3.
    """
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    nt, d = x_new.shape
    if d > 3:
        raise NotImplementedError(
            "df64 NUFFT supports d <= 3 (high-precision path)")
    if d == 3:
        slab = min(slab, 256)    # (s, m, m, m) df temporaries bound memory
    rdtype = x_new.dtype
    npad = _pad_pow2_chunks(nt, slab)
    if npad != nt:
        x_new = jnp.concatenate(
            [x_new, jnp.zeros((npad - nt, d), rdtype)], axis=0)
    shape = (mtot,) * d
    cr = (c_re[0].reshape(shape), c_re[1].reshape(shape))
    ci = (c_im[0].reshape(shape), c_im[1].reshape(shape))

    def one_slab(xs):
        # hard_materialize at the phase/contraction seams: XLA:CPU
        # deletes lax.optimization_barrier early and fuses the
        # df_sincos_2pi polynomial into the two_sum reduction trees, a
        # pattern whose LLVM codegen takes minutes per slab (measured
        # 96 s at (256, 13, 13) vs ~0.3 s split); see
        # df64.hard_materialize.
        _, cos1, sin1 = df_phase_factors(xs[:, 0], h_df, mtot, isign=+1)
        cos1, sin1 = hard_materialize((cos1, sin1))
        if d == 1:
            tr, ti = _cdf_mul((cr[0][None, :], cr[1][None, :]),
                              (ci[0][None, :], ci[1][None, :]),
                              cos1_b(cos1), sin1_b(sin1))
            return df_sum_tree(tr, axis=-1)
        _, cos2, sin2 = df_phase_factors(xs[:, 1], h_df, mtot, isign=+1)
        cos2, sin2 = hard_materialize((cos2, sin2))
        if d == 3:
            _, cos3, sin3 = df_phase_factors(xs[:, 2], h_df, mtot,
                                             isign=+1)
            cos3, sin3 = hard_materialize((cos3, sin3))
            # stage 0: contract modes l (last axis) against dim-3 phases
            c3r = (cos3[0][:, None, None, :], cos3[1][:, None, None, :])
            c3i = (sin3[0][:, None, None, :], sin3[1][:, None, None, :])
            tr, ti = _cdf_mul((cr[0][None], cr[1][None]),
                              (ci[0][None], ci[1][None]), c3r, c3i)
            tr = df_sum_tree(tr, axis=-1)       # (s, m, m) df
            ti = df_sum_tree(ti, axis=-1)
            tr, ti = hard_materialize((tr, ti))
            c2r = (cos2[0][:, None, :], cos2[1][:, None, :])
            c2i = (sin2[0][:, None, :], sin2[1][:, None, :])
            tr, ti = _cdf_mul(tr, ti, c2r, c2i)
            tr = df_sum_tree(tr, axis=-1)       # (s, m) df
            ti = df_sum_tree(ti, axis=-1)
            tr, ti = hard_materialize((tr, ti))
            rr, _ = _cdf_mul(tr, ti, cos1, sin1)
            return df_sum_tree(rr, axis=-1)
        # stage 1: contract modes k (last axis) against dim-2 phases
        c2r = (cos2[0][:, None, :], cos2[1][:, None, :])
        c2i = (sin2[0][:, None, :], sin2[1][:, None, :])
        tr, ti = _cdf_mul((cr[0][None, :, :], cr[1][None, :, :]),
                          (ci[0][None, :, :], ci[1][None, :, :]),
                          c2r, c2i)
        tr = df_sum_tree(tr, axis=-1)           # (s, mtot) df
        ti = df_sum_tree(ti, axis=-1)
        tr, ti = hard_materialize((tr, ti))
        # stage 2: contract modes j against dim-1 phases; real part only
        rr, _ = _cdf_mul(tr, ti, cos1, sin1)
        return df_sum_tree(rr, axis=-1)         # (s,) df

    def cos1_b(cs):
        return (cs[0][:, None], cs[1][:, None])

    def sin1_b(sn):
        return (sn[0][:, None], sn[1][:, None])

    slabs = x_new.reshape(-1, slab, d)
    hi, lo = lax.map(one_slab, slabs)
    return hi.reshape(-1)[:nt], lo.reshape(-1)[:nt]
