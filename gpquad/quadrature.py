"""Equispaced Fourier quadrature node selection (layer L3).

TPU-native re-design of the reference's ``GetTruncationBound`` + ``get_xis``
(reference: utils/kernels.py:7-69, 72-143).  The bisection runs as a single
jitted ``lax.fori_loop`` pair — one device dispatch instead of ~400 host
round-trips — and the same code path is traceable, so grid geometry (h, hm)
can also be computed *inside* a jitted training step against a padded static
grid (see :func:`padded_grid_mask`).

Math parity:
  - ``h = 1 / (L + Ltime)``   where ``k(Ltime) = eps`` (aliasing control)
  - ``hm = ceil(Lfreq / h)``  where ``|r|^(d-1) S(r)/S(0) = trunc_eps``
    (truncation control), integral method of utils/kernels.py:94-105.
  - closed-form SE / Matérn heuristics of utils/kernels.py:107-134.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "truncation_bound",
    "grid_geometry",
    "grid_geometry_jit",
    "spectral_grid",
    "padded_grid_mask",
    "bucket_mtot",
    "bucket_points",
]


def truncation_bound(f, eps, *, initial_upper: float = 1000.0,
                     lower: float = 0.0, iters: int = 200,
                     doublings: int = 10):
    """Find L with f(L) ~= eps for monotone-decreasing ``f`` by bisection.

    Traceable equivalent of ``GetTruncationBound.find_truncation_bound``
    (utils/kernels.py:28-69): an upper bound is located by doubling (<=10x),
    then ``iters`` bisection steps run in a ``fori_loop``.
    """
    eps = jnp.asarray(eps, dtype=jnp.result_type(float))

    def dbl(_, b):
        return jnp.where(f(b) > eps, b * 2.0, b)

    b = lax.fori_loop(0, doublings, dbl,
                      jnp.asarray(initial_upper, dtype=eps.dtype))

    def bis(_, ab):
        a, b = ab
        mid = 0.5 * (a + b)
        gt = f(mid) > eps
        return (jnp.where(gt, mid, a), jnp.where(gt, b, mid))

    a, b = lax.fori_loop(0, iters, bis,
                         (jnp.asarray(lower, dtype=eps.dtype), b))
    return 0.5 * (a + b)


def grid_geometry(kernel, eps, L, *, use_integral: bool = True,
                  l2scaled: bool = False,
                  trunc_eps: Optional[float] = None):
    """Traceable computation of the quadrature geometry ``(h, hm_real)``.

    ``h`` is the frequency-node spacing, and ``hm_real`` the (real-valued)
    half-count of nodes needed to cover the eps-support ``[-Lfreq, Lfreq]``;
    callers take ``mtot = 2*ceil(hm_real) + 1``.

    Integral method: utils/kernels.py:94-105.  Heuristics: :107-134.
    """
    if trunc_eps is None:
        trunc_eps = eps

    if use_integral:
        Ltime = truncation_bound(lambda r: kernel.kernel(r), eps)
        h = 1.0 / (L + Ltime)
        s0 = kernel.spectral_density(jnp.zeros((1,)))[0]
        d = kernel.dimension

        def khat_mod(r):
            return (jnp.abs(r ** (d - 1))
                    * kernel.spectral_density(jnp.asarray(r)[None])[0] / s0)

        Lfreq = truncation_bound(khat_mod, trunc_eps)
        hm_real = Lfreq / h
        return h, hm_real

    # --- closed-form heuristics (utils/kernels.py:107-134) -----------------
    from .kernels.matern import Matern
    from .kernels.squared_exponential import SquaredExponential

    l = kernel.lengthscale
    var = kernel.variance
    d = kernel.dimension
    if isinstance(kernel, Matern):
        nu = kernel.nu
        eps_use = eps / var
        if l2scaled:
            rl2sq = ((2 * nu / jnp.pi / l**2) ** (d / 2)
                     * kernel.spectral_density(jnp.zeros((1,)))[0] ** 2 / 2
                     * math.gamma(d / 2 + 2 * nu) / math.gamma(d + 2 * nu)
                     * 2.0 ** (-d / 2))
            eps_use = eps * jnp.sqrt(rl2sq)
        h = 1.0 / (L + 0.85 * l / math.sqrt(nu) * jnp.log(1.0 / eps_use))
        hm_real = ((jnp.pi ** (nu + d / 2) * l ** (2 * nu) * eps_use / 0.15)
                   ** (-1.0 / (2 * nu + d / 2))) / h
        return h, hm_real
    if isinstance(kernel, SquaredExponential):
        eps_use = eps / var
        if l2scaled:
            rl2sq = (kernel.kernel(jnp.zeros(())) ** 2
                     * (jnp.sqrt(jnp.pi) * l**2) ** d)
            eps_use = eps * jnp.sqrt(rl2sq)
        h = 1.0 / (L + l * jnp.sqrt(2.0 * jnp.log(4 * d * 3**d / eps_use)))
        hm_real = (jnp.sqrt(jnp.log(d * 4.0 ** (d + 1) / eps_use) / 2.0)
                   / jnp.pi / l) / h
        return h, hm_real
    raise NotImplementedError(
        "Heuristic grid selection only for SE/Matérn; use use_integral=True."
    )


@partial(jax.jit, static_argnames=("use_integral", "l2scaled"))
def _grid_geometry_compiled(kernel, eps, L, trunc_eps, *, use_integral,
                            l2scaled):
    return grid_geometry(kernel, eps, L, use_integral=use_integral,
                         l2scaled=l2scaled, trunc_eps=trunc_eps)


def grid_geometry_jit(kernel, eps, L, *, use_integral: bool = True,
                      l2scaled: bool = False,
                      trunc_eps: Optional[float] = None):
    """Compiled-once grid geometry.

    The eager path re-traces the bisection closures on every call (one slow
    recompile per hyperparameter step on the remote-TPU backend); this entry
    point keys the jit cache on the kernel's pytree structure so repeated
    planning during hyper learning reuses one executable.
    """
    return _grid_geometry_compiled(
        kernel, jnp.asarray(eps), jnp.asarray(L),
        jnp.asarray(eps if trunc_eps is None else trunc_eps),
        use_integral=use_integral, l2scaled=l2scaled)


def spectral_grid(kernel, eps, L, *, use_integral: bool = True,
                  l2scaled: bool = False,
                  trunc_eps: Optional[float] = None
                  ) -> Tuple[np.ndarray, float, int]:
    """Host-side grid planner — concrete ``(xis_1d, h, mtot)``.

    Drop-in behavioral equivalent of the reference's ``get_xis``
    (utils/kernels.py:72-143): ``xis = arange(-hm, hm+1) * h``.
    """
    h, hm_real = grid_geometry_jit(
        kernel, eps, L, use_integral=use_integral, l2scaled=l2scaled,
        trunc_eps=trunc_eps)
    h = float(h)
    hm = int(math.ceil(float(hm_real) - 1e-12))
    xis = np.arange(-hm, hm + 1, dtype=np.float64) * h
    return xis, h, 2 * hm + 1


_BUCKET_GROWTH = 1.25


def bucket_mtot(mtot: int, minimum: int = 9) -> int:
    """Round a grid size up to a bucketed ladder of odd sizes.

    Hyperparameter moves resize the frequency grid every gradient step
    (reference efgpnd.py:94-99 recomputes ``get_xis`` per step).  Under XLA
    that would trigger a recompile per step; instead grids are padded to the
    next rung of a geometric ladder and the surplus nodes carry exactly-zero
    quadrature weight (see :func:`padded_grid_mask`), which is algebraically
    a no-op for every operator built on the grid.
    """
    m = max(minimum, mtot)
    rung = minimum
    while rung < m:
        rung = int(rung * _BUCKET_GROWTH) + 1
    # force odd (grids are symmetric: 2*hm+1 points)
    if rung % 2 == 0:
        rung += 1
    return rung


def bucket_points(n: int, minimum: int = 100) -> int:
    """Round a point count up to a 1-2-5 decade ladder.

    Padding ``n`` to a static rung lets jitted point-space programs (the
    fused PG outer step in particular) compile once per rung instead of
    once per dataset size — the same trick :func:`bucket_mtot` plays for
    the frequency grid.  Padded points carry exactly-zero weights
    (delta/kappa/probes), so every operator built on them is algebraically
    unchanged.
    """
    if n <= minimum:
        return minimum
    rung = minimum
    while rung < n:
        lead = int(str(rung)[0])
        rung = rung * 2 if lead in (1, 5) else rung * 5 // 2   # 1->2->5->10
    return rung


def bucket_neighbors(mtot: int, minimum: int = 9):
    """``(down, up)`` adjacent rungs of the :func:`bucket_mtot` ladder
    around ``mtot`` (``down`` is None at the ladder bottom).

    Used by the PG estimator's cold-start rung prefetch: hyper moves
    that cross a rung boundary would otherwise stall the fit on a fresh
    ~20 s outer-step compile (scripts/profile_compile.py), so the
    estimator warms the adjacent rungs' programs on a background thread
    while iterating on the current one.
    """
    r, prev = minimum, None
    while True:
        cur = r + 1 if r % 2 == 0 else r
        nxt_raw = int(r * _BUCKET_GROWTH) + 1
        nxt = nxt_raw + 1 if nxt_raw % 2 == 0 else nxt_raw
        if cur >= mtot:
            return prev, nxt
        prev = cur
        r = nxt_raw


@partial(jax.jit, static_argnames=("mtot_pad", "d", "dtype"))
def flat_grid_mask(mtot_pad: int, d: int, hm, dtype=jnp.float32):
    """Flat d-dim active-node mask for a padded tensor grid: the product of
    per-dimension 1-D masks, shape ``(mtot_pad**d,)``.  Jitted so the
    per-training-step mask build is one dispatch."""
    m_pad = (mtot_pad - 1) // 2
    j = jnp.abs(jnp.arange(-m_pad, m_pad + 1))
    mask1 = (j <= hm).astype(dtype)
    out = mask1
    for _ in range(d - 1):
        out = (out[:, None] * mask1[None, :]).reshape(-1)
    return out


def padded_grid_mask(mtot_pad: int, hm, h, dtype=None):
    """Static-shape grid of ``mtot_pad`` nodes with an active-node mask.

    Returns ``(xis_1d, mask_1d)`` where ``xis_1d[j] = (j - m_pad) * h`` and
    ``mask_1d`` is 1 for ``|j - m_pad| <= hm`` else 0.  ``hm`` and ``h`` may
    be traced, so a jitted training step handles grid growth/shrink without
    shape changes: quadrature weights are multiplied by the mask, making the
    padded nodes exact zeros of D (and hence of D T D).
    """
    m_pad = (mtot_pad - 1) // 2
    j = jnp.arange(-m_pad, m_pad + 1, dtype=dtype or jnp.result_type(float))
    xis = j * h
    mask = (jnp.abs(j) <= hm).astype(xis.dtype)
    return xis, mask
