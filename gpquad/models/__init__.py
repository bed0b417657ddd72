"""Models / estimators built on the structured-operator core."""
from .efgp import (FitState, fit, fit_with_grid, predict_mean, predict_var,
                   posterior_fourier_rows, quadrature_weights, tensor_grid)
from .gradient import GradientResult, gradient, gradient_with_grid
from .model import EFGP
from .pg import PolyagammaGPClassifier, PolyagammaGPNegativeBinomialRegressor
from .sampling import (sample_bernoulli_gp, sample_bernoulli_gp_spectral,
                       sample_gp_dense, sample_gp_matern, sample_gp_spectral)

__all__ = [
    "FitState", "fit", "fit_with_grid", "predict_mean", "predict_var",
    "posterior_fourier_rows", "quadrature_weights", "tensor_grid",
    "GradientResult", "gradient", "gradient_with_grid", "EFGP",
    "PolyagammaGPClassifier", "PolyagammaGPNegativeBinomialRegressor",
    "sample_bernoulli_gp", "sample_bernoulli_gp_spectral",
    "sample_gp_dense", "sample_gp_matern", "sample_gp_spectral",
]
