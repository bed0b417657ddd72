"""FFT-based d-dimensional block-Toeplitz (BTTB) matvec (component C2).

TPU-native re-design of the reference ``ToeplitzND`` (efgpnd.py:1239-1393):
the Gram matrix F*F of the equispaced Fourier design is multilevel Toeplitz,
so its matvec is a d-dim circular convolution — pad to a power-of-two FFT
size chosen at trace time (static shapes for XLA), multiply by the cached
kernel FFT, inverse transform, and slice the central block.

Everything is expressed over the trailing ``d`` axes so arbitrary leading
batch dimensions broadcast for free (the reference special-cases flat vs
block layouts at runtime, efgpnd.py:1344-1355; here both are static
reshapes).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["ToeplitzND", "make_toeplitz", "toeplitz_diag_scale"]


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _next_smooth(n: int) -> int:
    """Smallest 2,3,5,7-smooth integer >= n (reference _next_fast_fft_size,
    efgpnd.py:1303-1329)."""
    def is_smooth(k):
        for p in (2, 3, 5, 7):
            while k % p == 0:
                k //= p
        return k == 1
    while not is_smooth(n):
        n += 1
    return n


@dataclasses.dataclass(frozen=True)
class ToeplitzND:
    """Multilevel Toeplitz operator T with precomputed kernel spectrum."""
    fft_kernel: jnp.ndarray                 # (*fft_shape,) complex
    ns: Tuple[int, ...] = dataclasses.field(metadata={"static": True},
                                            default=())
    fft_shape: Tuple[int, ...] = dataclasses.field(metadata={"static": True},
                                                   default=())

    @property
    def d(self) -> int:
        return len(self.ns)

    @property
    def size(self) -> int:
        out = 1
        for n in self.ns:
            out *= n
        return out

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply T to ``x`` with trailing flat (M,) or block ``ns`` layout;
        any leading dims are batch."""
        with jax.named_scope("toeplitz_matvec"):
            return self._apply(x)

    def _apply(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.d
        flat = x.shape[-1] == self.size and (
            x.ndim < d or tuple(x.shape[-d:]) != tuple(self.ns))
        if d == 1:
            flat = True  # 1-D: flat and block coincide
        batch = x.shape[:-1] if flat else x.shape[:-d]
        xb = x.reshape(batch + tuple(self.ns)).astype(self.fft_kernel.dtype)

        axes = tuple(range(xb.ndim - d, xb.ndim))
        xf = jnp.fft.fftn(xb, s=self.fft_shape, axes=axes)
        yf = xf * self.fft_kernel
        y = jnp.fft.ifftn(yf, axes=axes)
        # central block: output lag k needs rows n-1 .. 2n-2 of the circular
        # convolution (reference efgpnd.py:1289-1290, 1381-1387)
        sl = tuple([slice(None)] * (xb.ndim - d)
                   + [slice(n - 1, 2 * n - 1) for n in self.ns])
        y = y[sl]
        return y.reshape(batch + (self.size,)) if flat else y


def make_toeplitz(v: jnp.ndarray, *, force_pow2: bool = True) -> ToeplitzND:
    """Build the operator from the full convolution vector ``v``.

    ``v`` has shape ``(2 n_1 - 1, ..., 2 n_d - 1)`` holding all Toeplitz
    lags (the reference builds it on a ``(4m+1)^d`` grid for an
    ``n = 2m+1`` block, efgpnd.py:1395-1421).
    """
    if not jnp.iscomplexobj(v):
        v = v.astype(jnp.complex64 if v.dtype == jnp.float32
                     else jnp.complex128)
    Ls = v.shape
    ns = tuple((L + 1) // 2 for L in Ls)
    sizer = _next_pow2 if force_pow2 else _next_smooth
    fft_shape = tuple(sizer(L) for L in Ls)
    axes = tuple(range(-len(Ls), 0))
    fft_kernel = jnp.fft.fftn(v, s=fft_shape, axes=axes)
    return ToeplitzND(fft_kernel=fft_kernel, ns=ns, fft_shape=fft_shape)


def toeplitz_diag_scale(v: jnp.ndarray):
    """Zero-lag (diagonal) entry of T, used to scale the Jacobi
    preconditioner (reference efgpnd.py:125-127): for EFGP's convolution
    vector this equals N, the number of data points."""
    center = tuple((s - 1) // 2 for s in v.shape)
    return jnp.real(v[center])


jax.tree_util.register_dataclass(
    ToeplitzND, data_fields=["fft_kernel"], meta_fields=["ns", "fft_shape"]
)
