"""gpquad — TPU-native equispaced-Fourier Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``danbider/gp-quadrature`` (EFGP regression, Polya-Gamma GP classification,
SKI baseline) for TPU hardware: MXU-matmul NUFFT applies, FFT Toeplitz Gram
matvecs, lane-masked batched PCG, keyed stochastic trace estimators, and
``shard_map`` scale-out over device meshes.
"""
from . import kernels, ops, quadrature
from .kernels import HyperState, Matern, SquaredExponential, make_kernel
from .models.efgp import (FitState, fit, fit_with_grid, predict_mean,
                          predict_var)
from .models.gradient import GradientResult, gradient, gradient_with_grid
from .models.model import EFGP
from .models.pg import (PolyagammaGPClassifier,
                        PolyagammaGPNegativeBinomialRegressor)

__version__ = "0.1.0"

__all__ = [
    "kernels", "ops", "quadrature",
    "HyperState", "Matern", "SquaredExponential", "make_kernel",
    "FitState", "fit", "fit_with_grid", "predict_mean", "predict_var",
    "GradientResult", "gradient", "gradient_with_grid", "EFGP",
    "PolyagammaGPClassifier", "PolyagammaGPNegativeBinomialRegressor",
]
