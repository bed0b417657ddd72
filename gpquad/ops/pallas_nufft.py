"""Fused Pallas NUFFT kernels (TPU hard-part #1, SURVEY §7).

The default MXU path (ops/nufft.py) materializes per-dimension phase
matrices ``E_t in C^{N x mtot}`` in HBM — ~1.6 GB at n=1e6, mtot=100.
These Pallas kernels compute the phases **on the fly in VMEM**, tile by
tile, and fuse the transcendentals (cos/sin) with the complex matmuls on
the MXU:

  type-2 (uniform -> points), d=2:
      per point-tile: build cos/sin of theta_t = 2 pi frac(x h) k in VMEM,
      t = f @ conj(E2)^T as 4 real (m x m)@(m x TN) matmuls,
      out = rowsum(conj(E1) * t^T) on the VPU.
  type-1 (points -> uniform), d=2:
      per point-tile: accumulate (E1 * v)^T @ E2 into the (m, m) output
      block across the sequential TPU grid.

HBM traffic drops from O(N mtot) (phase matrices) to O(N d) point reads
plus the O(mtot^2) coefficient block.  Numerics are identical to the MXU
path (same range reduction; f32 cos/sin).

Kernels run in interpreter mode automatically off-TPU so the CPU test
suite exercises them against the dense oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_nufft2_2d", "pallas_nufft1_2d",
           "pallas_nufft2_1d", "pallas_nufft1_1d",
           "pallas_nufft2_3d", "pallas_nufft1_3d",
           "pallas_nufft1_2d_batched", "pallas_nufft2_2d_batched",
           "PallasNUFFT"]


def _k_values(m: int, fft_order: bool):
    """Mode indices: symmetric -m..m (FINUFFT modeord=False) or FFT order
    0..m, -m..-1 (modeord=True, used by the stochastic-variance evaluation,
    reference efgpnd.py:1666-1679)."""
    half = (m - 1) // 2
    if fft_order:
        return jnp.concatenate([jnp.arange(0, half + 1),
                                jnp.arange(-half, 0)]).astype(jnp.float32)
    return jnp.arange(-half, half + 1, dtype=jnp.float32)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# minimax polynomials for sin/cos(2 pi r) on the quadrant r in [-1/4, 1/4]
# (max err ~3e-9): Mosaic's native transcendentals are fast approximations
# (~2e-3 observed), far below NUFFT accuracy targets.
_SIN_C = (6.2831851596e+00, -4.1341654929e+01, 8.1600998193e+01,
          -7.6549656821e+01, 3.9535813712e+01)
_COS_C = (9.9999999978e-01, -1.9739208548e+01, 6.4939346553e+01,
          -8.5453568195e+01, 6.0143952339e+01, -2.4981836146e+01)


def _cos_sin_cycles(c):
    """Accurate cos/sin of 2*pi*c for cycle argument c in [-0.5, 0.5]."""
    q = jnp.round(2.0 * c)                 # quadrant in {-1, 0, 1}
    r = c - 0.5 * q
    r2 = r * r
    s = r * (_SIN_C[0] + r2 * (_SIN_C[1] + r2 * (_SIN_C[2]
             + r2 * (_SIN_C[3] + r2 * _SIN_C[4]))))
    co = (_COS_C[0] + r2 * (_COS_C[1] + r2 * (_COS_C[2]
          + r2 * (_COS_C[3] + r2 * (_COS_C[4] + r2 * _COS_C[5])))))
    sign = 1.0 - 2.0 * jnp.abs(q)          # (-1)^q for q in {-1,0,1}
    return sign * co, sign * s


def _type2_kernel(x_ref, fre_ref, fim_ref, k_ref, h_ref, out_ref):
    """One point-tile of the fused type-2 apply (d=2)."""
    m = fre_ref.shape[0]
    x = x_ref[...]                         # (TN, 2)
    h = h_ref[0]
    k = k_ref[...]                         # (1, m)

    def cos_sin(col):
        t = x[:, col] * h
        u = t - jnp.round(t)               # torus fold
        cyc = u[:, None] * k               # (TN, m)
        cyc = cyc - jnp.round(cyc)
        return _cos_sin_cycles(cyc)        # +theta: conj(E) = e^{+i theta}

    c1, s1 = cos_sin(0)
    c2, s2 = cos_sin(1)
    fre = fre_ref[...]
    fim = fim_ref[...]
    # full-precision f32 MXU passes: Pallas dots default to bf16-level
    # precision (~2e-3 observed) without HIGHEST
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    # t[j, n] = sum_k f[j, k] (c2 + i s2)[n, k]
    t_re = dot(fre, c2.T) - dot(fim, s2.T)     # (m, TN)
    t_im = dot(fre, s2.T) + dot(fim, c2.T)
    # out[n] = sum_j (c1 + i s1)[n, j] t[j, n]
    out_re = jnp.sum(c1 * t_re.T - s1 * t_im.T, axis=1)
    out_im = jnp.sum(c1 * t_im.T + s1 * t_re.T, axis=1)
    out_ref[...] = jnp.stack([out_re, out_im], axis=1)


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                              "fft_order"))
def pallas_nufft2_2d(x, f, h, *, mtot: int, tile: int = 512,
                     interpret: bool | None = None,
                     fft_order: bool = False):
    """Fused type-2 apply for d=2: ``out[n] = sum_jk f[j,k] e^{+2 pi i
    x_n . (h k)}``.  ``f`` complex (mtot, mtot) or flat; returns complex
    (N,)."""
    if interpret is None:
        interpret = not _on_tpu()
    n = x.shape[0]
    m = mtot
    f = f.reshape(m, m)
    if m > _MODE_TILE:
        return _pallas_nufft2_2d_tiled(x, f, h, mtot=mtot, tile=tile,
                                       mode_tile=_MODE_TILE,
                                       interpret=interpret,
                                       fft_order=fft_order)
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 2), jnp.float32).at[:n].set(x.astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    out = pl.pallas_call(
        _type2_kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 2), jnp.float32),
        interpret=interpret,
    )(xp, jnp.real(f).astype(jnp.float32), jnp.imag(f).astype(jnp.float32),
      kvals, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(out[:n, 0], out[:n, 1])


def _type1_kernel(x_ref, vre_ref, vim_ref, k_ref, h_ref, ore_ref, oim_ref):
    """Accumulate one point-tile into the (m, m) type-1 output (d=2)."""
    i = pl.program_id(0)
    x = x_ref[...]
    h = h_ref[0]
    k = k_ref[...]

    def cos_sin(col):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * k
        cyc = cyc - jnp.round(cyc)
        co, s = _cos_sin_cycles(cyc)       # E = e^{-i theta} (isign=-1)
        return co, -s

    c1, s1 = cos_sin(0)                    # (TN, m)
    c2, s2 = cos_sin(1)
    vre = vre_ref[...][:, 0]               # (TN,)
    vim = vim_ref[...][:, 0]
    # w = E1 * v  (complex, (TN, m))
    w_re = c1 * vre[:, None] - s1 * vim[:, None]
    w_im = c1 * vim[:, None] + s1 * vre[:, None]
    # full-precision f32 MXU passes: Pallas dots default to bf16-level
    # precision (~2e-3 observed) without HIGHEST
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    acc_re = dot(w_re.T, c2) - dot(w_im.T, s2)    # (m, m)
    acc_im = dot(w_re.T, s2) + dot(w_im.T, c2)

    @pl.when(i == 0)
    def _():
        ore_ref[...] = acc_re
        oim_ref[...] = acc_im

    @pl.when(i > 0)
    def _():
        ore_ref[...] += acc_re
        oim_ref[...] += acc_im


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                              "fft_order"))
def pallas_nufft1_2d(x, vals, h, *, mtot: int, tile: int = 512,
                     interpret: bool | None = None,
                     fft_order: bool = False):
    """Fused type-1 apply for d=2: ``out[j,k] = sum_n v_n e^{-2 pi i
    x_n . (h k)}``; returns complex (mtot, mtot)."""
    if interpret is None:
        interpret = not _on_tpu()
    n = x.shape[0]
    m = mtot
    if m > _MODE_TILE:
        return _pallas_nufft1_2d_tiled(x, vals, h, mtot=mtot, tile=tile,
                                       mode_tile=_MODE_TILE,
                                       interpret=interpret,
                                       fft_order=fft_order)
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 2), jnp.float32).at[:n].set(x.astype(jnp.float32))
    vre = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.real(vals).astype(jnp.float32))
    vim = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.imag(vals).astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    ore, oim = pl.pallas_call(
        _type1_kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((m, m), jnp.float32),
                   jax.ShapeDtypeStruct((m, m), jnp.float32)),
        interpret=interpret,
    )(xp, vre, vim, kvals, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(ore, oim)


import dataclasses


@dataclasses.dataclass(frozen=True)
class PallasNUFFT:
    """Drop-in NUFFT backend built on the fused kernels (d in {1, 2, 3}).

    Same duck-typed interface as ops.nufft.NUFFT (type1/type2, batched via
    sequential kernel launches) but stores only the raw points: phase
    factors never touch HBM.  Select with
    ``make_nufft(..., method="pallas")``.
    """
    x: jnp.ndarray           # (N, d)
    h: jnp.ndarray
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)
    fft_order: bool = dataclasses.field(metadata={"static": True},
                                        default=False)

    @property
    def d(self) -> int:
        return self.x.shape[1]

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def _t1(self):
        return {1: pallas_nufft1_1d, 2: pallas_nufft1_2d,
                3: pallas_nufft1_3d}[self.d]

    def _t2(self):
        return {1: pallas_nufft2_1d, 2: pallas_nufft2_2d,
                3: pallas_nufft2_3d}[self.d]

    def _batched_fits(self, B: int) -> bool:
        """One-launch in-kernel batching for d=2 when (B, m, m) f32 pairs
        fit VMEM (single-block kernels only)."""
        m = self.mtot
        return (self.d == 2 and m <= _MODE_TILE
                and B * m * m <= _BATCH_VMEM_BUDGET)

    def type1(self, vals):
        f = self._t1()
        if vals.ndim == 1:
            return f(self.x, vals, self.h, mtot=self.mtot,
                     fft_order=self.fft_order)
        lead = vals.shape[:-1]
        flat = vals.reshape((-1, vals.shape[-1]))
        if self._batched_fits(flat.shape[0]):
            out = pallas_nufft1_2d_batched(self.x, flat, self.h,
                                           mtot=self.mtot,
                                           fft_order=self.fft_order)
            return out.reshape(lead + (self.mtot,) * self.d)
        out = jax.lax.map(
            lambda v: f(self.x, v, self.h, mtot=self.mtot,
                        fft_order=self.fft_order),
            flat)
        return out.reshape(lead + (self.mtot,) * self.d)

    def type2(self, fk):
        f2 = self._t2()
        m = self.mtot
        M = m ** self.d
        block = (m,) * self.d
        if fk.shape == (M,) or fk.shape == block:
            return f2(self.x, fk, self.h, mtot=m, fft_order=self.fft_order)
        lead = fk.shape[:-1] if fk.shape[-1] == M else fk.shape[:-self.d]
        flat = fk.reshape((-1,) + block)
        if self._batched_fits(flat.shape[0]):
            out = pallas_nufft2_2d_batched(self.x, flat, self.h, mtot=m,
                                           fft_order=self.fft_order)
            return out.reshape(lead + (self.n,))
        out = jax.lax.map(
            lambda f: f2(self.x, f, self.h, mtot=m,
                         fft_order=self.fft_order), flat)
        return out.reshape(lead + (self.n,))


jax.tree_util.register_dataclass(
    PallasNUFFT, data_fields=["x", "h"], meta_fields=["mtot", "fft_order"]
)


# ---------------------------------------------------------------------------
# mode-tiled variants: VMEM holds only (tile x MB) phase blocks, so mtot is
# no longer bounded by ~500 (the single-block kernels overflow VMEM there).
# Grid order puts the reduction axis innermost so output blocks accumulate
# in place (standard TPU reduction pattern).
# ---------------------------------------------------------------------------

_MODE_TILE = 256


def _type2_tiled_kernel(x_ref, fre_ref, fim_ref, k1_ref, k2_ref, h_ref,
                        out_ref):
    jt = pl.program_id(1)
    kt = pl.program_id(2)
    x = x_ref[...]
    h = h_ref[0]

    def cos_sin(col, kv):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * kv
        cyc = cyc - jnp.round(cyc)
        return _cos_sin_cycles(cyc)

    c1, s1 = cos_sin(0, k1_ref[...])       # (TN, MB)
    c2, s2 = cos_sin(1, k2_ref[...])
    fre = fre_ref[...]
    fim = fim_ref[...]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    t_re = dot(fre, c2.T) - dot(fim, s2.T)     # (MB, TN)
    t_im = dot(fre, s2.T) + dot(fim, c2.T)
    out_re = jnp.sum(c1 * t_re.T - s1 * t_im.T, axis=1)
    out_im = jnp.sum(c1 * t_im.T + s1 * t_re.T, axis=1)
    acc = jnp.stack([out_re, out_im], axis=1)

    @pl.when((jt == 0) & (kt == 0))
    def _():
        out_ref[...] = acc

    @pl.when((jt > 0) | (kt > 0))
    def _():
        out_ref[...] += acc


def _pallas_nufft2_2d_tiled(x, f, h, *, mtot, tile, mode_tile, interpret,
                            fft_order=False):
    n = x.shape[0]
    m = mtot
    mb = mode_tile
    mp = -(-m // mb) * mb
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 2), jnp.float32).at[:n].set(x.astype(jnp.float32))
    fp = jnp.zeros((mp, mp), f.dtype).at[:m, :m].set(f.reshape(m, m))
    kv = jnp.zeros((1, mp), jnp.float32).at[0, :m].set(
        _k_values(m, fft_order))
    out = pl.pallas_call(
        _type2_tiled_kernel,
        grid=(ntile, mp // mb, mp // mb),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, mb), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, mb), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2), lambda i, j, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 2), jnp.float32),
        interpret=interpret,
    )(xp, jnp.real(fp).astype(jnp.float32), jnp.imag(fp).astype(jnp.float32),
      kv, kv, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(out[:n, 0], out[:n, 1])


def _type1_tiled_kernel(x_ref, vre_ref, vim_ref, k1_ref, k2_ref, h_ref,
                        ore_ref, oim_ref):
    i = pl.program_id(2)                   # reduction axis (points)
    x = x_ref[...]
    h = h_ref[0]

    def cos_sin(col, kv):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * kv
        cyc = cyc - jnp.round(cyc)
        co, s = _cos_sin_cycles(cyc)
        return co, -s                      # isign = -1

    c1, s1 = cos_sin(0, k1_ref[...])
    c2, s2 = cos_sin(1, k2_ref[...])
    vre = vre_ref[...][:, 0]
    vim = vim_ref[...][:, 0]
    w_re = c1 * vre[:, None] - s1 * vim[:, None]
    w_im = c1 * vim[:, None] + s1 * vre[:, None]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    acc_re = dot(w_re.T, c2) - dot(w_im.T, s2)
    acc_im = dot(w_re.T, s2) + dot(w_im.T, c2)

    @pl.when(i == 0)
    def _():
        ore_ref[...] = acc_re
        oim_ref[...] = acc_im

    @pl.when(i > 0)
    def _():
        ore_ref[...] += acc_re
        oim_ref[...] += acc_im


def _pallas_nufft1_2d_tiled(x, vals, h, *, mtot, tile, mode_tile, interpret,
                            fft_order=False):
    n = x.shape[0]
    m = mtot
    mb = mode_tile
    mp = -(-m // mb) * mb
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 2), jnp.float32).at[:n].set(x.astype(jnp.float32))
    vre = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.real(vals).astype(jnp.float32))
    vim = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.imag(vals).astype(jnp.float32))
    kv = jnp.zeros((1, mp), jnp.float32).at[0, :m].set(
        _k_values(m, fft_order))
    ore, oim = pl.pallas_call(
        _type1_tiled_kernel,
        grid=(mp // mb, mp // mb, ntile),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda j, k, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, k, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, k, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb), lambda j, k, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb), lambda j, k, i: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((mb, mb), lambda j, k, i: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, mb), lambda j, k, i: (j, k),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((mp, mp), jnp.float32),
                   jax.ShapeDtypeStruct((mp, mp), jnp.float32)),
        interpret=interpret,
    )(xp, vre, vim, kv, kv, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(ore[:m, :m], oim[:m, :m])


# ---------------------------------------------------------------------------
# d=1 and d=3 kernels.  d=1 is a fused matvec (cheap, for API uniformity);
# d=3 factorizes the tensor contraction per point-tile:
#   type-2:  A[(j,k), n] = sum_l f[j,k,l] E3[n,l]      (MXU)
#            B[j, n]     = sum_k A[(j,k), n] E2[n,k]   (VPU reduce)
#            out[n]      = sum_j B[j, n] E1[n,j]       (VPU reduce)
#   type-1:  U[n, (j,k)] = (E1 v)[n,j] E2[n,k]         (VPU outer)
#            acc[(j,k), l] += U^T @ E3                 (MXU)
# so HBM traffic stays O(N d) point reads + the coefficient block —
# the MXU path's three (N, mtot) phase matrices (2.4 GB at n=1e6,
# mtot=100) never materialize.  VMEM bounds the single-block kernels at
# mtot <= ~56 for d=3; larger 3-D grids fall back to the MXU path.
# ---------------------------------------------------------------------------

_D3_MAX_MTOT = 56


def _type2_1d_kernel(x_ref, fre_ref, fim_ref, k_ref, h_ref, out_ref):
    x = x_ref[...]
    h = h_ref[0]
    k = k_ref[...]
    t = x[:, 0] * h
    u = t - jnp.round(t)
    cyc = u[:, None] * k
    cyc = cyc - jnp.round(cyc)
    c, s = _cos_sin_cycles(cyc)            # (TN, m), +theta
    fre = fre_ref[...][0]                  # (m,)
    fim = fim_ref[...][0]
    out_re = jnp.sum(c * fre[None, :] - s * fim[None, :], axis=1)
    out_im = jnp.sum(c * fim[None, :] + s * fre[None, :], axis=1)
    out_ref[...] = jnp.stack([out_re, out_im], axis=1)


def _type1_1d_kernel(x_ref, vre_ref, vim_ref, k_ref, h_ref, ore_ref,
                     oim_ref):
    i = pl.program_id(0)
    x = x_ref[...]
    h = h_ref[0]
    k = k_ref[...]
    t = x[:, 0] * h
    u = t - jnp.round(t)
    cyc = u[:, None] * k
    cyc = cyc - jnp.round(cyc)
    c, s = _cos_sin_cycles(cyc)
    s = -s                                 # isign = -1
    vre = vre_ref[...][:, 0]
    vim = vim_ref[...][:, 0]
    acc_re = jnp.sum(c * vre[:, None] - s * vim[:, None], axis=0)[None, :]
    acc_im = jnp.sum(c * vim[:, None] + s * vre[:, None], axis=0)[None, :]

    @pl.when(i == 0)
    def _():
        ore_ref[...] = acc_re
        oim_ref[...] = acc_im

    @pl.when(i > 0)
    def _():
        ore_ref[...] += acc_re
        oim_ref[...] += acc_im


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                             "fft_order"))
def pallas_nufft2_1d(x, f, h, *, mtot: int, tile: int = 1024,
                     interpret: bool | None = None, fft_order: bool = False):
    if interpret is None:
        interpret = not _on_tpu()
    n = x.shape[0]
    m = mtot
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 1), jnp.float32).at[:n].set(
        x.reshape(-1, 1).astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    f = f.reshape(m)
    out = pl.pallas_call(
        _type2_1d_kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 2), jnp.float32),
        interpret=interpret,
    )(xp, jnp.real(f).astype(jnp.float32)[None, :],
      jnp.imag(f).astype(jnp.float32)[None, :], kvals,
      jnp.asarray([h], jnp.float32))
    return jax.lax.complex(out[:n, 0], out[:n, 1])


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                             "fft_order"))
def pallas_nufft1_1d(x, vals, h, *, mtot: int, tile: int = 1024,
                     interpret: bool | None = None, fft_order: bool = False):
    if interpret is None:
        interpret = not _on_tpu()
    n = x.shape[0]
    m = mtot
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 1), jnp.float32).at[:n].set(
        x.reshape(-1, 1).astype(jnp.float32))
    vre = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.real(vals).astype(jnp.float32))
    vim = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.imag(vals).astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    ore, oim = pl.pallas_call(
        _type1_1d_kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((1, m), jnp.float32),
                   jax.ShapeDtypeStruct((1, m), jnp.float32)),
        interpret=interpret,
    )(xp, vre, vim, kvals, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(ore[0], oim[0])


def _type2_3d_kernel(x_ref, fre_ref, fim_ref, k_ref, h_ref, out_ref):
    # Mosaic cannot shape-cast (m*m, TN) <-> (m, m, TN) vectors, so the
    # dim-2 contraction is a static per-j1 loop over row slabs instead
    m = k_ref.shape[-1]
    x = x_ref[...]
    h = h_ref[0]
    k = k_ref[...]                         # (1, m)

    def cos_sin(col):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * k
        cyc = cyc - jnp.round(cyc)
        return _cos_sin_cycles(cyc)        # +theta

    c1, s1 = cos_sin(0)
    c2, s2 = cos_sin(1)
    c3, s3 = cos_sin(2)
    fre = fre_ref[...]                     # (m*m, m)
    fim = fim_ref[...]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    a_re = dot(fre, c3.T) - dot(fim, s3.T)      # (m*m, TN)
    a_im = dot(fre, s3.T) + dot(fim, c3.T)
    tn = x.shape[0]
    out_re = jnp.zeros((tn,), jnp.float32)
    out_im = jnp.zeros((tn,), jnp.float32)
    for j in range(m):
        aj_re = a_re[j * m:(j + 1) * m, :]      # (m, TN)
        aj_im = a_im[j * m:(j + 1) * m, :]
        bj_re = jnp.sum(aj_re.T * c2 - aj_im.T * s2, axis=1)   # (TN,)
        bj_im = jnp.sum(aj_re.T * s2 + aj_im.T * c2, axis=1)
        out_re += c1[:, j] * bj_re - s1[:, j] * bj_im
        out_im += c1[:, j] * bj_im + s1[:, j] * bj_re
    out_ref[...] = jnp.stack([out_re, out_im], axis=1)


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                             "fft_order"))
def pallas_nufft2_3d(x, f, h, *, mtot: int, tile: int = 128,
                     interpret: bool | None = None, fft_order: bool = False):
    if interpret is None:
        interpret = not _on_tpu()
    if mtot > _D3_TILED_MAX:
        raise NotImplementedError(
            f"pallas d=3 kernels support mtot <= {_D3_TILED_MAX}")
    if mtot > _D3_MAX_MTOT:
        return _pallas_nufft2_3d_tiled(x, f.reshape((mtot,) * 3), h,
                                       mtot=mtot, tile=tile,
                                       interpret=interpret,
                                       fft_order=fft_order)
    n = x.shape[0]
    m = mtot
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 3), jnp.float32).at[:n].set(x.astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    f2 = f.reshape(m * m, m)
    out = pl.pallas_call(
        _type2_3d_kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * m, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * m, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 2), jnp.float32),
        interpret=interpret,
    )(xp, jnp.real(f2).astype(jnp.float32), jnp.imag(f2).astype(jnp.float32),
      kvals, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(out[:n, 0], out[:n, 1])


def _type1_3d_kernel(x_ref, vre_ref, vim_ref, k_ref, h_ref, ore_ref,
                     oim_ref):
    i = pl.program_id(0)
    m = k_ref.shape[-1]
    x = x_ref[...]
    h = h_ref[0]
    k = k_ref[...]

    def cos_sin(col):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * k
        cyc = cyc - jnp.round(cyc)
        co, s = _cos_sin_cycles(cyc)
        return co, -s                      # isign = -1

    c1, s1 = cos_sin(0)                    # (TN, m)
    c2, s2 = cos_sin(1)
    c3, s3 = cos_sin(2)
    vre = vre_ref[...][:, 0]
    vim = vim_ref[...][:, 0]
    w_re = c1 * vre[:, None] - s1 * vim[:, None]        # (TN, m)
    w_im = c1 * vim[:, None] + s1 * vre[:, None]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    # static per-j1 loop (no (TN, m, m) -> (TN, m*m) shape cast in Mosaic):
    # rows j*m:(j+1)*m of the output are (E2^T diag(W_j)) @ E3
    for j in range(m):
        uj_re = w_re[:, j:j + 1] * c2 - w_im[:, j:j + 1] * s2   # (TN, m)
        uj_im = w_re[:, j:j + 1] * s2 + w_im[:, j:j + 1] * c2
        acc_re = dot(uj_re.T, c3) - dot(uj_im.T, s3)            # (m, m)
        acc_im = dot(uj_re.T, s3) + dot(uj_im.T, c3)
        rows = slice(j * m, (j + 1) * m)

        @pl.when(i == 0)
        def _(acc_re=acc_re, acc_im=acc_im, rows=rows):
            ore_ref[rows, :] = acc_re
            oim_ref[rows, :] = acc_im

        @pl.when(i > 0)
        def _(acc_re=acc_re, acc_im=acc_im, rows=rows):
            ore_ref[rows, :] += acc_re
            oim_ref[rows, :] += acc_im


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                             "fft_order"))
def pallas_nufft1_3d(x, vals, h, *, mtot: int, tile: int = 128,
                     interpret: bool | None = None, fft_order: bool = False):
    if interpret is None:
        interpret = not _on_tpu()
    if mtot > _D3_TILED_MAX:
        raise NotImplementedError(
            f"pallas d=3 kernels support mtot <= {_D3_TILED_MAX}")
    if mtot > _D3_MAX_MTOT:
        return _pallas_nufft1_3d_tiled(x, vals, h, mtot=mtot, tile=tile,
                                       interpret=interpret,
                                       fft_order=fft_order)
    n = x.shape[0]
    m = mtot
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 3), jnp.float32).at[:n].set(x.astype(jnp.float32))
    vre = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.real(vals).astype(jnp.float32))
    vim = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.imag(vals).astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    ore, oim = pl.pallas_call(
        _type1_3d_kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((m * m, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * m, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((m * m, m), jnp.float32),
                   jax.ShapeDtypeStruct((m * m, m), jnp.float32)),
        interpret=interpret,
    )(xp, vre, vim, kvals, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(ore, oim).reshape(m, m, m)


# ---------------------------------------------------------------------------
# batched d=2 kernels: the batch dimension lives INSIDE the kernel, so one
# launch serves all B coefficient blocks / point-value rows and the
# phase transcendentals are computed once per point-tile instead of once
# per batch element (PallasNUFFT.type1/type2 previously lax.map-ed one
# launch per element).  Single-block only: VMEM must hold (B, m, m) f32
# pairs, so the dispatch falls back to lax.map when B * m^2 is large.
# ---------------------------------------------------------------------------

_BATCH_VMEM_BUDGET = 2 ** 21          # f32 elements per (re, im) pair


def _type2_kernel_b(x_ref, fre_ref, fim_ref, k_ref, h_ref, out_ref):
    b = fre_ref.shape[0]
    x = x_ref[...]
    h = h_ref[0]
    k = k_ref[...]

    def cos_sin(col):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * k
        cyc = cyc - jnp.round(cyc)
        return _cos_sin_cycles(cyc)

    c1, s1 = cos_sin(0)
    c2, s2 = cos_sin(1)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    for j in range(b):
        fre = fre_ref[j]
        fim = fim_ref[j]
        t_re = dot(fre, c2.T) - dot(fim, s2.T)
        t_im = dot(fre, s2.T) + dot(fim, c2.T)
        out_re = jnp.sum(c1 * t_re.T - s1 * t_im.T, axis=1)
        out_im = jnp.sum(c1 * t_im.T + s1 * t_re.T, axis=1)
        out_ref[j] = jnp.stack([out_re, out_im], axis=1)


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                             "fft_order"))
def pallas_nufft2_2d_batched(x, f, h, *, mtot: int, tile: int = 512,
                             interpret: bool | None = None,
                             fft_order: bool = False):
    """Batched fused type-2: ``f`` (B, mtot, mtot) -> (B, N)."""
    if interpret is None:
        interpret = not _on_tpu()
    n = x.shape[0]
    m = mtot
    B = f.shape[0]
    f = f.reshape(B, m, m)
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 2), jnp.float32).at[:n].set(x.astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    out = pl.pallas_call(
        _type2_kernel_b,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((B, tile, 2), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npad, 2), jnp.float32),
        interpret=interpret,
    )(xp, jnp.real(f).astype(jnp.float32), jnp.imag(f).astype(jnp.float32),
      kvals, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(out[:, :n, 0], out[:, :n, 1])


def _type1_kernel_b(x_ref, vre_ref, vim_ref, k_ref, h_ref, ore_ref, oim_ref):
    i = pl.program_id(0)
    b = vre_ref.shape[1]
    x = x_ref[...]
    h = h_ref[0]
    k = k_ref[...]

    def cos_sin(col):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * k
        cyc = cyc - jnp.round(cyc)
        co, s = _cos_sin_cycles(cyc)
        return co, -s                      # isign = -1

    c1, s1 = cos_sin(0)
    c2, s2 = cos_sin(1)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    for j in range(b):
        vre = vre_ref[..., j]
        vim = vim_ref[..., j]
        w_re = c1 * vre[:, None] - s1 * vim[:, None]
        w_im = c1 * vim[:, None] + s1 * vre[:, None]
        acc_re = dot(w_re.T, c2) - dot(w_im.T, s2)
        acc_im = dot(w_re.T, s2) + dot(w_im.T, c2)

        @pl.when(i == 0)
        def _(acc_re=acc_re, acc_im=acc_im, j=j):
            ore_ref[j] = acc_re
            oim_ref[j] = acc_im

        @pl.when(i > 0)
        def _(acc_re=acc_re, acc_im=acc_im, j=j):
            ore_ref[j] += acc_re
            oim_ref[j] += acc_im


@functools.partial(jax.jit, static_argnames=("mtot", "tile", "interpret",
                                             "fft_order"))
def pallas_nufft1_2d_batched(x, vals, h, *, mtot: int, tile: int = 512,
                             interpret: bool | None = None,
                             fft_order: bool = False):
    """Batched fused type-1: ``vals`` (B, N) -> (B, mtot, mtot)."""
    if interpret is None:
        interpret = not _on_tpu()
    n = x.shape[0]
    m = mtot
    B = vals.shape[0]
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 2), jnp.float32).at[:n].set(x.astype(jnp.float32))
    vre = jnp.zeros((npad, B), jnp.float32).at[:n].set(
        jnp.real(vals).T.astype(jnp.float32))
    vim = jnp.zeros((npad, B), jnp.float32).at[:n].set(
        jnp.imag(vals).T.astype(jnp.float32))
    kvals = _k_values(m, fft_order).reshape(1, m)
    ore, oim = pl.pallas_call(
        _type1_kernel_b,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, m, m), jnp.float32),
                   jax.ShapeDtypeStruct((B, m, m), jnp.float32)),
        interpret=interpret,
    )(xp, vre, vim, kvals, jnp.asarray([h], jnp.float32))
    return jax.lax.complex(ore, oim)


# ---------------------------------------------------------------------------
# d=3 mode-tiled variants: the single-block d=3 kernels hold the full
# (m*m, m) coefficient block in VMEM and overflow past mtot ~ 56.  Tiling
# the FIRST mode dimension into JB-row slabs keeps VMEM at
# O(JB * m^2 + TN * m) and lifts the cap to _D3_TILED_MAX (VERDICT r2
# weak #5 / next #5).  Grid order keeps the reduction axis innermost so
# output blocks accumulate in place, mirroring the 2-D tiled kernels.
# ---------------------------------------------------------------------------

_D3_TILED_MAX = 256


def _d3_j1_block(m: int) -> int:
    """First-dim slab height: bound JB*m^2 f32 words per block pair."""
    return max(1, min(8, (1 << 19) // (m * m)))


def _k1_block(j, jb: int, mtot: int, fft_order: bool):
    """The JB mode values of first-dim slab ``j``, computed in-kernel from
    an iota: Mosaic cannot block a (1, mp1) array at lane width JB < 128,
    so the k1 stream is synthesized instead of loaded (padded rows j1 >=
    mtot get arbitrary values; their outputs are dropped / their
    coefficients are zero)."""
    idx = (j * jb
           + jax.lax.broadcasted_iota(jnp.int32, (1, jb), 1)
           ).astype(jnp.float32)
    half = (mtot - 1) // 2
    if fft_order:
        return idx - mtot * (idx > half).astype(jnp.float32)
    return idx - half


def _type2_3d_tiled_kernel(x_ref, fre_ref, fim_ref, k_ref, h_ref,
                           out_ref, *, jb: int, mtot: int,
                           fft_order: bool):
    jt = pl.program_id(1)
    m = k_ref.shape[-1]
    x = x_ref[...]
    h = h_ref[0]

    def cos_sin(col, kv):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * kv
        cyc = cyc - jnp.round(cyc)
        return _cos_sin_cycles(cyc)

    c1, s1 = cos_sin(0, _k1_block(jt, jb, mtot, fft_order))  # (TN, JB)
    c2, s2 = cos_sin(1, k_ref[...])        # (TN, m)
    c3, s3 = cos_sin(2, k_ref[...])
    fre = fre_ref[...]                     # (JB*m, m)
    fim = fim_ref[...]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    a_re = dot(fre, c3.T) - dot(fim, s3.T)      # (JB*m, TN)
    a_im = dot(fre, s3.T) + dot(fim, c3.T)
    tn = x.shape[0]
    out_re = jnp.zeros((tn,), jnp.float32)
    out_im = jnp.zeros((tn,), jnp.float32)
    for j in range(jb):
        aj_re = a_re[j * m:(j + 1) * m, :]
        aj_im = a_im[j * m:(j + 1) * m, :]
        bj_re = jnp.sum(aj_re.T * c2 - aj_im.T * s2, axis=1)
        bj_im = jnp.sum(aj_re.T * s2 + aj_im.T * c2, axis=1)
        out_re += c1[:, j] * bj_re - s1[:, j] * bj_im
        out_im += c1[:, j] * bj_im + s1[:, j] * bj_re
    acc = jnp.stack([out_re, out_im], axis=1)

    @pl.when(jt == 0)
    def _():
        out_ref[...] = acc

    @pl.when(jt > 0)
    def _():
        out_ref[...] += acc


def _pallas_nufft2_3d_tiled(x, f, h, *, mtot, tile, interpret,
                            fft_order=False):
    n = x.shape[0]
    m = mtot
    jb = _d3_j1_block(m)
    mp1 = -(-m // jb) * jb
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 3), jnp.float32).at[:n].set(x.astype(jnp.float32))
    # coefficients flattened to (m*m, m) rows indexed by (j1, j2); padded
    # j1 slabs hold zeros so they contribute nothing
    f2 = jnp.zeros((mp1 * m, m), jnp.complex64 if f.dtype == jnp.complex64
                   else f.dtype)
    f2 = f2.at[:m * m, :].set(f.reshape(m * m, m))
    kfull = _k_values(m, fft_order).reshape(1, m)
    out = pl.pallas_call(
        functools.partial(_type2_3d_tiled_kernel, jb=jb, mtot=m,
                          fft_order=fft_order),
        grid=(ntile, mp1 // jb),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb * m, m), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb * m, m), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 2), jnp.float32),
        interpret=interpret,
    )(xp, jnp.real(f2).astype(jnp.float32),
      jnp.imag(f2).astype(jnp.float32), kfull,
      jnp.asarray([h], jnp.float32))
    return jax.lax.complex(out[:n, 0], out[:n, 1])


def _type1_3d_tiled_kernel(x_ref, vre_ref, vim_ref, k_ref, h_ref,
                           ore_ref, oim_ref, *, jb: int, mtot: int,
                           fft_order: bool):
    jslab = pl.program_id(0)               # first-dim mode slab
    i = pl.program_id(1)                   # reduction axis (points)
    m = k_ref.shape[-1]
    x = x_ref[...]
    h = h_ref[0]

    def cos_sin(col, kv):
        t = x[:, col] * h
        u = t - jnp.round(t)
        cyc = u[:, None] * kv
        cyc = cyc - jnp.round(cyc)
        co, s = _cos_sin_cycles(cyc)
        return co, -s                      # isign = -1

    c1, s1 = cos_sin(0, _k1_block(jslab, jb, mtot, fft_order))  # (TN, JB)
    c2, s2 = cos_sin(1, k_ref[...])        # (TN, m)
    c3, s3 = cos_sin(2, k_ref[...])
    vre = vre_ref[...][:, 0]
    vim = vim_ref[...][:, 0]
    w_re = c1 * vre[:, None] - s1 * vim[:, None]        # (TN, JB)
    w_im = c1 * vim[:, None] + s1 * vre[:, None]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    for j in range(jb):
        uj_re = w_re[:, j:j + 1] * c2 - w_im[:, j:j + 1] * s2   # (TN, m)
        uj_im = w_re[:, j:j + 1] * s2 + w_im[:, j:j + 1] * c2
        acc_re = dot(uj_re.T, c3) - dot(uj_im.T, s3)            # (m, m)
        acc_im = dot(uj_re.T, s3) + dot(uj_im.T, c3)
        rows = slice(j * m, (j + 1) * m)

        @pl.when(i == 0)
        def _(acc_re=acc_re, acc_im=acc_im, rows=rows):
            ore_ref[rows, :] = acc_re
            oim_ref[rows, :] = acc_im

        @pl.when(i > 0)
        def _(acc_re=acc_re, acc_im=acc_im, rows=rows):
            ore_ref[rows, :] += acc_re
            oim_ref[rows, :] += acc_im


def _pallas_nufft1_3d_tiled(x, vals, h, *, mtot, tile, interpret,
                            fft_order=False):
    n = x.shape[0]
    m = mtot
    jb = _d3_j1_block(m)
    mp1 = -(-m // jb) * jb
    ntile = -(-n // tile)
    npad = ntile * tile
    xp = jnp.zeros((npad, 3), jnp.float32).at[:n].set(x.astype(jnp.float32))
    vre = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.real(vals).astype(jnp.float32))
    vim = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(
        jnp.imag(vals).astype(jnp.float32))
    kfull = _k_values(m, fft_order).reshape(1, m)
    ore, oim = pl.pallas_call(
        functools.partial(_type1_3d_tiled_kernel, jb=jb, mtot=m,
                          fft_order=fft_order),
        grid=(mp1 // jb, ntile),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((jb * m, m), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb * m, m), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((mp1 * m, m), jnp.float32),
                   jax.ShapeDtypeStruct((mp1 * m, m), jnp.float32)),
        interpret=interpret,
    )(xp, vre, vim, kfull, jnp.asarray([h], jnp.float32))
    out = jax.lax.complex(ore, oim).reshape(mp1, m, m)
    return out[:m]
