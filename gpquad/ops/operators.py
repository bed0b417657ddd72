"""EFGP structured-operator factory (components C3, C4).

Matrix-free building blocks over the weighted Gram operator
``G = D F*F D = D T D`` (D = diag quadrature weights, T multilevel
Toeplitz):

    A_mean(beta)  = G beta + sigma^2 beta        (mean solve)
    A_var(gamma)  = G gamma / sigma^2 + gamma    (variance solve)
    M_inv(v)      = v / (c |w|^2 + sigma^2)      (Jacobi preconditioner)

Parity: reference efgpnd.py:1572-1631 (closures) and 1395-1421
(convolution-vector builder).  All operators broadcast over arbitrary
leading batch dims, so the batched trace CG costs one fused FFT stack.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .nufft import make_nufft
from .toeplitz import ToeplitzND

__all__ = [
    "convolution_vector",
    "make_Gv",
    "make_A_mean",
    "make_A_var",
    "make_jacobi_precond",
]


def convolution_vector(m: int, x: jnp.ndarray, h, *, mask=None,
                       nufft_method: str = "mxu", cap=None) -> jnp.ndarray:
    """Toeplitz lag table v[k] = sum_n exp(-2 pi i <k, h x_n>), k in
    [-2m, 2m]^d — a type-1 NUFFT with unit weights on the doubled grid
    (reference efgpnd.py:1395-1421; eps fixed there at 6e-8, here the MXU
    path is exact)."""
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    op = make_nufft(x, h, 4 * m + 1, method=nufft_method, cap=cap)
    # real ones converted on device: the axon TPU runtime rejects eagerly
    # materialized complex host constants
    cdtype = jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128
    ones = jnp.ones((n,), dtype=x.dtype).astype(cdtype)
    return op.type1(ones)


def make_Gv(ws: jnp.ndarray, toeplitz: ToeplitzND) -> Callable:
    """G v = ws * T(ws * v) over the trailing feature axis
    (reference create_Gv, efgpnd.py:1572-1591)."""
    def Gv(v):
        v = v.astype(ws.dtype)
        return ws * toeplitz(ws * v)
    return Gv


def make_A_mean(ws, toeplitz, sigmasq) -> Callable:
    """A_mean = G + sigma^2 I (reference create_A_mean, efgpnd.py:1593-1600)."""
    Gv = make_Gv(ws, toeplitz)

    def A_mean(beta):
        beta = beta.astype(ws.dtype)
        return Gv(beta) + sigmasq * beta
    return A_mean


def make_A_var(ws, toeplitz, sigmasq) -> Callable:
    """A_var = G / sigma^2 + I (reference create_A_var, efgpnd.py:1602-1609)."""
    Gv = make_Gv(ws, toeplitz)

    def A_var(gamma):
        gamma = gamma.astype(ws.dtype)
        return Gv(gamma) / sigmasq + gamma
    return A_var


def make_jacobi_precond(ws, sigmasq, diag_scale=1.0) -> Callable:
    """Diagonal preconditioner 1 / (diag_scale |ws|^2 + sigma^2)
    (reference create_jacobi_precond, efgpnd.py:1619-1631).  For the EFGP
    convolution vector the exact Toeplitz diagonal is N, which is the
    ``diag_scale`` the model passes (efgpnd.py:125-127)."""
    diag = diag_scale * jnp.abs(ws) ** 2 + sigmasq

    def M_inv(v):
        return v / diag.astype(v.dtype)
    return M_inv
