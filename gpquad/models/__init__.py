"""Models / estimators built on the structured-operator core."""
from .efgp import (FitState, fit, fit_with_grid, predict_mean, predict_var,
                   posterior_fourier_rows, quadrature_weights, tensor_grid)

__all__ = [
    "FitState", "fit", "fit_with_grid", "predict_mean", "predict_var",
    "posterior_fourier_rows", "quadrature_weights", "tensor_grid",
]
