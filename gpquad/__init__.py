"""gpquad — TPU-native equispaced-Fourier Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``danbider/gp-quadrature`` (EFGP regression, Polya-Gamma GP classification,
SKI baseline) for TPU hardware: MXU-matmul NUFFT applies, FFT Toeplitz Gram
matvecs, lane-masked batched PCG, keyed stochastic trace estimators, and
``shard_map`` scale-out over device meshes.
"""
import os as _os

import jax as _jax

# Persistent XLA compile cache on by default: first-touch compiles through
# the remote-TPU tunnel run minutes (the PG module's cold start is ~7 min);
# the cache turns every later process's cold start into a disk read.
# Opt out with GPQUAD_NO_COMPILE_CACHE=1; an explicit user-configured cache
# (env or prior jax.config call) always wins.  CPU-pinned processes are
# excluded: XLA:CPU AOT cache entries encode machine features that can
# mismatch across processes (observed "+prefer-no-scatter ... could lead
# to SIGILL" loads), and CPU compiles are local anyway.
def _cpu_pinned() -> bool:
    # "cpu" must be the PRIMARY platform (the image pins "axon,cpu" with
    # cpu as mere fallback — that should still cache)
    for src in (_os.environ.get("JAX_PLATFORMS", ""),
                str(getattr(_jax.config, "jax_platforms", None) or "")):
        first = src.split(",")[0].strip().lower()
        if first == "cpu":
            return True
    return False


if not _os.environ.get("GPQUAD_NO_COMPILE_CACHE") \
        and not _os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        and not _cpu_pinned():
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(_os.path.expanduser("~"), ".cache",
                              "gpquad_xla"))
            _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                               1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

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
