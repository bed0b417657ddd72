"""Nonuniform Fourier design-matrix applies (layer L1, component C1).

The reference reaches FINUFFT's C++ spread/interpolate through
``pytorch_finufft`` (reference: efgpnd.py:1423-1549).  On TPU the same two
operators are recast as **separable complex matmuls on the MXU**: the EFGP
frequency nodes always lie on a tensor-product grid ``xi = k * h``,
``k in [-m, m]^d``, so

    (F* c)[k1..kd] = sum_n c_n prod_t exp(-2 pi i x[n,t] h k_t)
    (F  f)[n]      = sum_k f_k prod_t exp(+2 pi i x[n,t] h k_t)

factorizes through per-dimension phase matrices ``E_t in C^{N x mtot}``.
Each apply is then one (or d) large dense matmuls — exact (no spreading
eps), batched, and MXU-shaped — instead of FINUFFT's scatter/gather, which
maps poorly onto the VPU.  Cost is O(N * mtot^d) flops like the dense
oracle but with O(N * mtot * d) memory; for EFGP's grid sizes (mtot ~ 1e2)
this keeps the MXU busy and beats spread-based NUFFT well past n = 1e6.

Conventions match FINUFFT's as used by the reference:
``type1``: isign=-1, modeord=False (k ordered -m..m);
``type2``: isign=+1, modeord=False  (efgpnd.py:1496-1499, 1533-1548).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["NUFFT", "make_nufft", "nufft1", "nufft2"]

_HIGHEST = lax.Precision.HIGHEST


def _complex_dtype(real_dtype):
    return jnp.complex64 if jnp.dtype(real_dtype) == jnp.float32 else jnp.complex128


def _phase_matrix(t, k, cdtype):
    """E[n, j] = exp(-2 pi i t_n k_j) for t = h * x[:, dim].

    The angle is range-reduced and the product u * k is computed with a
    Dekker two-product compensation: in f32 the naive product carries
    ~|k| * 2^-24 cycles of error (~1e-5 rad at mtot ~ 100), which caps
    posterior-mean accuracy near 1e-3; the compensated path recovers the
    lost low bits (k and the 12-bit split halves of u multiply exactly),
    bringing the phase error to f32 rounding of the *reduced* angle.
    In f64 (CPU oracle runs) the same code is exact to ~1e-15.
    """
    u = t - jnp.round(t)                       # fold onto the unit torus
    p = u[:, None] * k[None, :]
    # Dekker split of u into 12-bit halves; k (integer, < 2^12) times each
    # half is exact in f32
    c = jnp.asarray(4097.0, u.dtype)           # 2^12 + 1
    u_big = u * c
    u_hi = u_big - (u_big - u)
    u_lo = u - u_hi
    err = (u_hi[:, None] * k[None, :] - p) + u_lo[:, None] * k[None, :]
    cycles = p - jnp.round(p)
    cycles = (cycles + err)
    cycles = cycles - jnp.round(cycles)        # keep |angle| <= pi
    ang = (-2.0 * jnp.pi) * cycles
    return lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(cdtype)


@dataclasses.dataclass(frozen=True)
class NUFFT:
    """Precomputed per-dimension phase matrices for a fixed point set.

    Analogue of the reference ``NUFFT`` class (efgpnd.py:1423-1549) whose
    ``phi = 2 pi h (x - xcen)`` precompute becomes the d phase matrices here.
    """
    phases: Tuple[jnp.ndarray, ...]   # d arrays of shape (N, mtot), complex
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)

    @property
    def d(self) -> int:
        return len(self.phases)

    @property
    def n(self) -> int:
        return self.phases[0].shape[0]

    # ------------------------------------------------------------------
    def type1(self, vals: jnp.ndarray) -> jnp.ndarray:
        """Adjoint apply F* : nonuniform -> uniform.

        ``vals``: (N,) or (B, N); returns (mtot,)*d or (B,) + (mtot,)*d.
        """
        with jax.named_scope("nufft_type1"):
            if vals.ndim == 1:
                return self._type1_single(vals)
            return jax.vmap(self._type1_single)(vals)

    def _type1_single(self, vals):
        cdtype = self.phases[0].dtype
        v = vals.astype(cdtype)
        n = v.shape[0]
        # Two-stage chunked accumulation: a single length-N f32 MXU
        # contraction accumulates ~sqrt(N) * 2^-24 relative error (a ~1e-5
        # perturbation of the Gram system at n=1e5, worth ~1e-3 in the
        # posterior mean).  Summing ~2k-point partials then reducing the
        # partials cuts the random walk ~30-60x; in f64 it is a no-op.
        chunk = 2048
        chunked = cdtype == jnp.complex64 and n >= 4 * chunk
        n_head = (n // chunk) * chunk if chunked else 0
        if self.d == 1:
            (e1,) = self.phases
            if chunked:
                partial = jnp.einsum(
                    "cn,cnj->cj", v[:n_head].reshape(-1, chunk),
                    e1[:n_head].reshape(-1, chunk, e1.shape[1]),
                    precision=_HIGHEST)
                out = jnp.sum(partial, axis=0)
                if n_head < n:
                    out = out + jnp.einsum("n,nj->j", v[n_head:],
                                           e1[n_head:], precision=_HIGHEST)
                return out
            return jnp.einsum("n,nj->j", v, e1, precision=_HIGHEST)
        if self.d == 2:
            e1, e2 = self.phases
            if chunked:
                m = self.mtot
                w = (e1[:n_head] * v[:n_head, None]).reshape(-1, chunk, m)
                partial = jnp.einsum(
                    "cnj,cnk->cjk", w,
                    e2[:n_head].reshape(-1, chunk, m), precision=_HIGHEST)
                out = jnp.sum(partial, axis=0)
                if n_head < n:
                    out = out + jnp.matmul(
                        (e1[n_head:] * v[n_head:, None]).T, e2[n_head:],
                        precision=_HIGHEST)
                return out
            # (mtot, N) @ (N, mtot): one MXU matmul
            return jnp.matmul((e1 * v[:, None]).T, e2, precision=_HIGHEST)
        if self.d == 3:
            e1, e2, e3 = self.phases
            m = self.mtot
            # contract n in j1-slabs to bound memory at O(N * mtot)
            def slab(j):
                w = e1[:, j] * v                                 # (N,)
                return jnp.matmul((e2 * w[:, None]).T, e3,
                                  precision=_HIGHEST)            # (m, m)
            return jax.vmap(slab)(jnp.arange(m))
        raise NotImplementedError("NUFFT supports d <= 3")

    # ------------------------------------------------------------------
    def type2(self, fk: jnp.ndarray) -> jnp.ndarray:
        """Forward apply F : uniform -> nonuniform.

        ``fk``: flat (M,) / block (mtot,)*d, or batched with a leading dim;
        returns (N,) or (B, N).
        """
        with jax.named_scope("nufft_type2"):
            return self._type2(fk)

    def _type2(self, fk: jnp.ndarray) -> jnp.ndarray:
        shape_block = (self.mtot,) * self.d
        M = self.mtot ** self.d
        if fk.ndim >= 1 and fk.shape == (M,):
            return self._type2_single(fk.reshape(shape_block))
        if fk.shape == shape_block:
            return self._type2_single(fk)
        # batched: leading dims collapse to one
        lead = fk.shape[: fk.ndim - 1] if fk.shape[-1] == M else \
            fk.shape[: fk.ndim - self.d]
        flat = fk.reshape((-1,) + shape_block)
        out = jax.vmap(self._type2_single)(flat)
        return out.reshape(lead + (self.n,))

    def _type2_single(self, fk):
        cdtype = self.phases[0].dtype
        f = fk.astype(cdtype)
        if self.d == 1:
            (e1,) = self.phases
            return jnp.einsum("nj,j->n", jnp.conj(e1), f, precision=_HIGHEST)
        if self.d == 2:
            e1, e2 = self.phases
            tmp = jnp.matmul(f, jnp.conj(e2).T, precision=_HIGHEST)  # (m, N)
            return jnp.sum(jnp.conj(e1) * tmp.T, axis=1)
        if self.d == 3:
            e1, e2, e3 = self.phases
            # per-j1 slab: (m, m) @ (m, N) -> reduce over j2 with conj(e2)
            def slab(fj):   # fj: (m, m)
                t = jnp.matmul(fj, jnp.conj(e3).T, precision=_HIGHEST)  # (m, N)
                return jnp.sum(jnp.conj(e2) * t.T, axis=1)              # (N,)
            per_j1 = jax.vmap(slab)(f)                                  # (m, N)
            return jnp.sum(jnp.conj(e1) * per_j1.T, axis=1)
        raise NotImplementedError("NUFFT supports d <= 3")


def make_nufft(x: jnp.ndarray, h, mtot: int, *, xcen=None,
               cdtype=None, fft_order: bool = False,
               method: str = "mxu", cap: Optional[int] = None):
    """Build the NUFFT operator for points ``x`` (N, d) on grid spacing ``h``.

    ``fft_order=False`` gives FINUFFT modeord=False ordering k = -m..m (the
    default everywhere in the reference); ``fft_order=True`` gives FFT
    ordering 0..m, -m..-1 as needed by the stochastic-variance evaluation
    (reference efgpnd.py:1666-1679 uses modeord=True).

    ``method="pallas"`` (d in {1, 2, 3}, both mode orderings) selects the
    fused Pallas kernels, which never materialize phase matrices in HBM
    (d=3 mode-tiles its first dim past mtot = 56, up to mtot <= 256).
    ``method="spread"`` (d=2, symmetric ordering) selects the classical
    scatter/gather ES-kernel spreading backend (no cap planning needed);
    ``method="banded"`` (d in {2, 3}, symmetric ordering) selects the scatter-free
    banded spread/interp backend — fastest at very large mtot; its static
    band ``cap`` is planned on the host when ``x`` is concrete, or must be
    passed explicitly (``ops.spread_banded.banded_plan_cap``) under jit.
    ``method="sub"`` (d in {2, 3}, symmetric ordering) selects the
    subproblem-scheduled banded backend: same algebra, but cost adapts to
    occupancy (best for clustered points) and planning is data-free — no
    cap needed, works under jit with traced points.
    """
    if x.ndim == 1:
        x = x[:, None]
    if mtot % 2 != 1:
        raise ValueError(f"mtot must be odd (symmetric grid -m..m), got {mtot}")
    if method == "pallas":
        if x.shape[1] not in (1, 2, 3):
            raise NotImplementedError("pallas NUFFT supports d in {1, 2, 3}")
        from .pallas_nufft import PallasNUFFT
        return PallasNUFFT(x=x, h=jnp.asarray(h, x.dtype), mtot=mtot,
                           fft_order=fft_order)
    if method == "banded":
        if x.shape[1] not in (2, 3) or fft_order:
            raise NotImplementedError(
                "banded NUFFT supports d in {2, 3} with symmetric mode "
                "ordering")
        from .spread_banded import (BandedNUFFT, BandedNUFFT3D,
                                    banded_plan_cap, banded_plan_cap_3d)
        plan = banded_plan_cap if x.shape[1] == 2 else banded_plan_cap_3d
        if cap is None:
            if isinstance(x, jax.core.Tracer) or isinstance(
                    h, jax.core.Tracer):
                raise ValueError(
                    "banded NUFFT under jit needs a static band cap; plan "
                    "it outside with ops.spread_banded.banded_plan_cap and "
                    "pass cap=, or use method='sub' (data-free planning)")
            cap = plan(x, float(h), mtot)
        cls = BandedNUFFT if x.shape[1] == 2 else BandedNUFFT3D
        return cls(x=x, h=jnp.asarray(h, x.dtype), mtot=mtot, cap=cap)
    if method == "sub":
        if x.shape[1] not in (2, 3) or fft_order:
            raise NotImplementedError(
                "sub NUFFT supports d in {2, 3} with symmetric mode "
                "ordering")
        from .spread_banded import SubNUFFT, SubNUFFT3D
        cls = SubNUFFT if x.shape[1] == 2 else SubNUFFT3D
        return cls(x=x, h=jnp.asarray(h, x.dtype), mtot=mtot)
    if method == "spread":
        if x.shape[1] != 2 or fft_order:
            raise NotImplementedError(
                "spread NUFFT supports d=2 with symmetric mode ordering")
        from .spread_nufft import SpreadNUFFT
        return SpreadNUFFT(x=x, h=jnp.asarray(h, x.dtype), mtot=mtot)
    if method != "mxu":
        raise ValueError(f"Unknown NUFFT method '{method}'")
    n, d = x.shape
    rdtype = x.dtype
    cdtype = cdtype or _complex_dtype(rdtype)
    if xcen is not None:
        x = x - xcen[None, :]
    m = (mtot - 1) // 2
    if fft_order:
        k = jnp.concatenate([jnp.arange(0, m + 1), jnp.arange(-m, 0)]
                            ).astype(rdtype)
    else:
        k = jnp.arange(-m, m + 1, dtype=rdtype)
    t = x * jnp.asarray(h, dtype=rdtype)
    phases = tuple(_phase_matrix(t[:, i], k, cdtype) for i in range(d))
    return NUFFT(phases=phases, mtot=mtot)


def nufft1(x, vals, h, mtot, **kw):
    """One-shot type-1 (F*) apply; see :class:`NUFFT`."""
    return make_nufft(x, h, mtot, **kw).type1(vals)


def nufft2(x, fk, h, mtot, **kw):
    """One-shot type-2 (F) apply; see :class:`NUFFT`."""
    return make_nufft(x, h, mtot, **kw).type2(fk)


jax.tree_util.register_dataclass(
    NUFFT, data_fields=["phases"], meta_fields=["mtot"]
)
