"""Matrix-free structured operators (NUFFT, Toeplitz, CG, trace estimators)."""
from .cg import CGResult, pcg
from .nufft import NUFFT, make_nufft, nufft1, nufft2
from .operators import (convolution_vector, make_A_mean, make_A_var, make_Gv,
                        make_jacobi_precond)
from .toeplitz import ToeplitzND, make_toeplitz, toeplitz_diag_scale

__all__ = [
    "CGResult", "pcg",
    "NUFFT", "make_nufft", "nufft1", "nufft2",
    "convolution_vector", "make_A_mean", "make_A_var", "make_Gv",
    "make_jacobi_precond",
    "ToeplitzND", "make_toeplitz", "toeplitz_diag_scale",
]
