"""Double-word ("double-float", df64) arithmetic primitives.

TPUs have no native f64 (axon silently truncates); the EFGP accuracy
target — posterior mean agreeing with the f64 dense oracle to ~1e-6 —
requires residuals and right-hand sides accurate well below the f32
random-walk floor.  A double-word number is an unevaluated sum
``hi + lo`` of two machine floats with ``|lo| <= ulp(hi)/2``; sums and
products built from the classic error-free transformations (Dekker 1971,
Knuth TAOCP 4.2.2) carry ~2x the mantissa (~48 bits in f32 pairs).

All functions operate on (hi, lo) tuples of equal-shape arrays and are
dtype-generic: f32 pairs on TPU (~1e-14 unit roundoff), f64 pairs in the
CPU x64 test suite (~1e-32), which lets the same code be oracle-tested
against mpmath-free numpy f64.

The reference has no analogue (it runs f64 on CPU/CUDA throughout, e.g.
pg_classifier.py:1094 defaults dtype float64); this module is what makes
the f64-grade numbers reachable on TPU hardware.
"""
from __future__ import annotations

from decimal import Decimal, getcontext
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "two_sum", "quick_two_sum", "split", "two_prod",
    "df_add", "df_sub", "df_mul", "df_mul_f", "df_neg", "df_from",
    "df_sum_tree", "df_sincos_2pi", "hard_materialize",
    "cdf_add", "cdf_sub", "cdf_mul", "cdf_from",
]

DF = Tuple[jnp.ndarray, jnp.ndarray]


# ---------------------------------------------------------------------------
# error-free transformations
# ---------------------------------------------------------------------------

def two_sum(a, b) -> DF:
    """s + e == a + b exactly (Knuth; 6 flops, branch-free).

    Valid componentwise, so complex arrays work too (addition never mixes
    real/imaginary parts).
    """
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b) -> DF:
    """s + e == a + b exactly, REQUIRES |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split_factor(dtype) -> float:
    # 2^ceil(p/2) + 1: 4097 for f32 (p=24), 2^27+1 for f64 (p=53)
    return 4097.0 if jnp.dtype(dtype) == jnp.float32 else 134217729.0


def split(a) -> DF:
    """Dekker split of ``a`` into high/low half-mantissa parts (exact)."""
    c = jnp.asarray(_split_factor(a.dtype), a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b) -> DF:
    """p + e == a * b exactly (Dekker two-product via splits; real only)."""
    p = a * b
    ahi, alo = split(a)
    bhi, blo = split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# double-word arithmetic
# ---------------------------------------------------------------------------

def df_from(a) -> DF:
    return a, jnp.zeros_like(a)


def df_neg(x: DF) -> DF:
    return -x[0], -x[1]


def df_add(x: DF, y: DF) -> DF:
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return quick_two_sum(s, e)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def df_mul_f(x: DF, s) -> DF:
    """df64 times a plain float array."""
    p, e = two_prod(x[0], s)
    e = e + x[1] * s
    return quick_two_sum(p, e)


def hard_materialize(t):
    """Force a pytree of arrays into materialized buffers — a fusion
    barrier that XLA:CPU actually honors.

    ``lax.optimization_barrier`` is deleted early in the XLA:CPU
    pipeline (it appears in the before_optimizations HLO and is gone
    after, with producers fused straight through), so it cannot stop
    the CPU backend from fusing a ``df_sincos_2pi`` polynomial into a
    downstream two_sum reduction tree — a fused pattern whose LLVM
    codegen takes minutes for a (256, 13) slab (vs ~0.1 s split).  A
    while_loop body is a separate HloComputation and fusion never
    crosses computation boundaries; a data-dependent trip bound keeps
    WhileLoopSimplifier from proving trip count 1 and inlining it.
    Cost: one elementwise multiply per tensor per call.  On any backend
    other than CPU this returns ``t`` untouched: XLA:TPU compiles and
    runs the fused df64 forms fine (bench-proven), so the barrier is
    pure CPU medicine and TPU programs stay identical to the measured
    ones.  ``jax.default_backend()`` is resolved at trace time, so each
    backend's jit cache gets its own specialization.
    """
    if jax.default_backend() != "cpu":
        return t
    leaves, tree = jax.tree_util.tree_flatten(t)
    probe = jnp.isfinite(
        jnp.real(leaves[0]).ravel()[0]).astype(jnp.int32)

    def body(carry):
        i, vals = carry
        # data-dependent gain (always 1 at runtime): not hoistable by
        # loop-invariant code motion, not foldable by AlgSimp
        g = jnp.where(i < jnp.int32(0), 2.0, 1.0)
        return i + 1, tuple(v * g.astype(jnp.real(v).dtype)
                            for v in vals)

    _, out = lax.while_loop(lambda c: c[0] < probe, body,
                            (jnp.int32(0), tuple(leaves)))
    return jax.tree_util.tree_unflatten(tree, list(out))


def df_sum_tree(x: DF, axis: int = 0) -> DF:
    """Compensated pairwise reduction of a df64 array along ``axis``.

    Accumulation error stays ~unit-roundoff-of-df64 regardless of length
    (vs the f32 sqrt(n) random walk this module exists to avoid).

    The reduction runs IN PLACE along ``axis`` — never via a
    moveaxis-to-front.  XLA:CPU assigns the transposed operand a
    column-major layout (the transpose becomes a bitcast), so the
    PHYSICAL minor dim of every two_sum stays the caller's — odd
    whenever it is a mode axis (mtot^d is always odd) — and LLVM both
    compiles (minutes vs seconds) and executes (measured 86 s vs 0.1 s
    at (256, 13)) such chains pathologically; an optimization_barrier
    does not help because it materializes in the same layout.  Instead:
    the minor dim is zero-padded to even when some OTHER axis is
    reduced, and the reduction axis itself is zero-padded to a power of
    two (zero pads are exact through two_sum: two_sum(x, 0) == (x, 0)),
    which also removes the odd-leftover concatenate lanes of a general
    halving.
    """
    hi, lo = x
    ax = axis % hi.ndim
    last = hi.ndim - 1
    trail_pad = hi.ndim >= 2 and ax != last and hi.shape[-1] % 2 == 1
    if trail_pad:
        widths = [(0, 0)] * last + [(0, 1)]
        hi = jnp.pad(hi, widths)
        lo = jnp.pad(lo, widths)
    n = hi.shape[ax]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        widths = [(0, 0)] * hi.ndim
        widths[ax] = (0, p - n)
        hi = jnp.pad(hi, widths)
        lo = jnp.pad(lo, widths)
    from jax import lax as _lax
    while p > 1:
        half = p // 2
        s, e = two_sum(_lax.slice_in_dim(hi, 0, half, axis=ax),
                       _lax.slice_in_dim(hi, half, p, axis=ax))
        e = e + (_lax.slice_in_dim(lo, 0, half, axis=ax)
                 + _lax.slice_in_dim(lo, half, p, axis=ax))
        s, e = quick_two_sum(s, e)
        hi, lo = s, e
        p = half
    hi = _lax.squeeze(hi, (ax,))
    lo = _lax.squeeze(lo, (ax,))
    if trail_pad:
        return hi[..., :-1], lo[..., :-1]
    return hi, lo


# ---------------------------------------------------------------------------
# complex df64: a (re, im) pair of real df64 pairs
# ---------------------------------------------------------------------------

CDF = Tuple[DF, DF]


def cdf_from(re, im) -> CDF:
    return df_from(re), df_from(im)


def cdf_add(x: CDF, y: CDF) -> CDF:
    return df_add(x[0], y[0]), df_add(x[1], y[1])


def cdf_sub(x: CDF, y: CDF) -> CDF:
    return df_sub(x[0], y[0]), df_sub(x[1], y[1])


def cdf_mul(x: CDF, y: CDF) -> CDF:
    re = df_sub(df_mul(x[0], y[0]), df_mul(x[1], y[1]))
    im = df_add(df_mul(x[0], y[1]), df_mul(x[1], y[0]))
    return re, im


# ---------------------------------------------------------------------------
# sin/cos of 2*pi*cycles to df64 accuracy
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _sincos_coeffs(dtype_name: str):
    """df64-split Taylor coefficients of sin(2 pi r), cos(2 pi r) computed
    at 50 decimal digits; after the |r| <= 1/8 range reduction the series
    truncates below 1e-14 (f32 pairs) at these orders."""
    getcontext().prec = 50
    two_pi = Decimal(2) * Decimal(
        "3.14159265358979323846264338327950288419716939937510")
    fact = [Decimal(1)]
    for i in range(1, 20):
        fact.append(fact[-1] * i)
    sin_c = [(-1) ** k * two_pi ** (2 * k + 1) / fact[2 * k + 1]
             for k in range(8)]     # r^1 .. r^15
    cos_c = [(-1) ** k * two_pi ** (2 * k) / fact[2 * k]
             for k in range(9)]     # r^0 .. r^16
    np_dtype = np.float32 if dtype_name == "float32" else np.float64

    def dsplit(dec):
        hi = np_dtype(float(dec))
        lo = np_dtype(float(dec - Decimal(float(hi))))
        return float(hi), float(lo)

    return tuple(dsplit(c) for c in sin_c), tuple(dsplit(c) for c in cos_c)


def df_sincos_2pi(c: DF) -> Tuple[DF, DF]:
    """(sin(2 pi c), cos(2 pi c)) as df64 pairs, for cycles ``c`` in
    roughly [-0.5, 0.5] (a couple of ulps beyond is fine).

    Reduction: q = round(4 c) in {-2..2}, r = c - q/4 with |r| <= 1/8
    (the f32 subtraction is exact by Sterbenz), then Taylor in df64 and
    quadrant reconstruction.
    """
    dtype = c[0].dtype
    sin_c, cos_c = _sincos_coeffs(jnp.dtype(dtype).name)
    q = jnp.round(4.0 * c[0])
    r = quick_two_sum(c[0] - 0.25 * q, c[1])

    s2 = df_mul(r, r)
    cst = lambda v: (jnp.asarray(v[0], dtype), jnp.asarray(v[1], dtype))

    p = cst(sin_c[-1])
    for k in range(len(sin_c) - 2, -1, -1):
        p = df_add(df_mul(p, s2), cst(sin_c[k]))
    sin_r = df_mul(r, p)

    p = cst(cos_c[-1])
    for k in range(len(cos_c) - 2, -1, -1):
        p = df_add(df_mul(p, s2), cst(cos_c[k]))
    cos_r = p

    # quadrant: sin(theta + q pi/2), cos(theta + q pi/2)
    q1 = jnp.abs(q) == 1
    q2 = jnp.abs(q) == 2
    sgnq = jnp.sign(q).astype(dtype)

    def pick(plain, quarter, half):
        hi = jnp.where(q2, half[0], jnp.where(q1, quarter[0], plain[0]))
        lo = jnp.where(q2, half[1], jnp.where(q1, quarter[1], plain[1]))
        return hi, lo

    sin_out = pick(sin_r, (sgnq * cos_r[0], sgnq * cos_r[1]),
                   df_neg(sin_r))
    cos_out = pick(cos_r, (-sgnq * sin_r[0], -sgnq * sin_r[1]),
                   df_neg(cos_r))
    return sin_out, cos_out
