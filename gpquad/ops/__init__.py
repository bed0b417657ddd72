"""Matrix-free structured operators (NUFFT, Toeplitz, CG, trace estimators)."""
from .cg import CGResult, pcg
from .deflation import deflation_block, make_block_precond, \
    make_deflation_precond
from .nufft import NUFFT, make_nufft, nufft1, nufft2
from .operators import (convolution_vector, make_A_mean, make_A_var, make_Gv,
                        make_jacobi_precond)
from .ozaki import ozaki_nufft1
from .toeplitz import ToeplitzND, make_toeplitz, toeplitz_diag_scale

__all__ = [
    "CGResult", "pcg",
    "NUFFT", "make_nufft", "nufft1", "nufft2",
    "convolution_vector", "make_A_mean", "make_A_var", "make_Gv",
    "make_jacobi_precond",
    "deflation_block", "make_block_precond", "make_deflation_precond",
    "ozaki_nufft1",
    "ToeplitzND", "make_toeplitz", "toeplitz_diag_scale",
]
