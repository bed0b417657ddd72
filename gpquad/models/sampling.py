"""GP prior / synthetic-data samplers (component C14).

TPU-native re-design of the reference's ``vanilla_gp_sampling.py:100-381``:
dense Cholesky samplers for small oracle problems, and the EFGP spectral
prior sampler — proper complex-Gaussian Fourier coefficients pushed through
one type-2 NUFFT (an MXU matmul here), which scales to millions of points.

All functions take explicit PRNG keys instead of global seeds.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels import Matern, SquaredExponential
from ..ops.cg import pcg
from ..ops.nufft import make_nufft
from ..ops.operators import make_A_mean
from ..quadrature import spectral_grid
from .efgp import _cdtype, quadrature_weights, tensor_grid

__all__ = [
    "sample_gp_dense",
    "sample_gp_matern",
    "sample_gp_spectral",
    "sample_bernoulli_gp",
    "sample_bernoulli_gp_spectral",
    "sample_posterior_pathwise",
]


def sample_gp_dense(key, x, kernel, *, noise_variance: float = 0.1,
                    num_samples: int = 1, mean=None, jitter: float = 1e-6):
    """Dense Cholesky GP sampler (reference sample_gp_fast,
    vanilla_gp_sampling.py:100-163).  O(n^3) — oracle scale.

    Returns (n,) for one sample or (n, num_samples).
    """
    x = x[:, None] if x.ndim == 1 else x
    n = x.shape[0]
    K = kernel.kernel_matrix(x, x)
    Kn = K + (noise_variance + jitter) * jnp.eye(n, dtype=K.dtype)
    L = jnp.linalg.cholesky(Kn)
    z = jax.random.normal(key, (n, num_samples), dtype=K.dtype)
    mu = jnp.zeros((n,), K.dtype) if mean is None else mean
    samples = mu[:, None] + L @ z
    return samples[:, 0] if num_samples == 1 else samples


def sample_gp_matern(key, x, *, nu: float = 1.5, lengthscale: float = 1.0,
                     variance: float = 1.0, noise_variance: float = 0.1,
                     num_samples: int = 1):
    """Matérn dense sampler (reference sample_gp_matern,
    vanilla_gp_sampling.py:262-301)."""
    d = 1 if x.ndim == 1 else x.shape[1]
    kern = Matern(lengthscale=lengthscale, variance=variance,
                  dimension=d, nu=nu)
    return sample_gp_dense(key, x, kern, noise_variance=noise_variance,
                           num_samples=num_samples)


def sample_gp_spectral(key, x, *, lengthscale: float = 1.0,
                       variance: float = 1.0, num_samples: int = 1,
                       spectral_eps: float = 1e-4,
                       trunc_eps: Optional[float] = 1e-4, mean=None,
                       kernel=None):
    """EFGP spectral-approximation prior sampler (reference
    sample_gp_spectral_approx, vanilla_gp_sampling.py:166-260).

    Draws proper complex Gaussians c ~ CN(0, I), evaluates
    ``sqrt(2) Re[F (D c)]`` — a sample of the rank-M approximate prior
    ``K ~ F D^2 F*``.  Scales O(n M) on the MXU.
    """
    x = x[:, None] if x.ndim == 1 else x
    n, d = x.shape
    rdtype = x.dtype
    if kernel is None:
        kernel = SquaredExponential(lengthscale=jnp.asarray(lengthscale, rdtype),
                                    variance=jnp.asarray(variance, rdtype),
                                    dimension=d)
    L = float(jnp.max(jnp.max(x, axis=0) - jnp.min(x, axis=0)))
    if L <= 1e-9:
        L = 1.0
    _, h, mtot = spectral_grid(kernel, spectral_eps, L,
                               trunc_eps=trunc_eps)
    samples = _spectral_draw(key, x, kernel, h, mtot=mtot,
                             num_samples=num_samples)
    if mean is not None:
        samples = samples + mean[None, :]
    return samples[0] if num_samples == 1 else samples.T


@partial(jax.jit, static_argnames=("mtot", "num_samples"))
def _spectral_draw(key, x, kernel, h, *, mtot: int, num_samples: int):
    n, d = x.shape
    rdtype = x.dtype
    cdtype = _cdtype(rdtype)
    h = jnp.asarray(h, rdtype)
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=rdtype) * h, d)
    ws = quadrature_weights(kernel, xis, h, d)
    M = ws.shape[0]
    kr, ki = jax.random.split(key)
    cr = jax.random.normal(kr, (num_samples, M), dtype=rdtype)
    ci = jax.random.normal(ki, (num_samples, M), dtype=rdtype)
    coeffs = jax.lax.complex(cr, ci).astype(cdtype) / jnp.sqrt(2.0).astype(rdtype)
    nufft = make_nufft(x, h, mtot, cdtype=cdtype)
    latent = nufft.type2(ws[None, :] * coeffs)
    return jnp.sqrt(2.0).astype(rdtype) * latent.real


def sample_bernoulli_gp(key, x, *, lengthscale: float = 1.0,
                        variance: float = 1.0,
                        noise_variance: float = 1e-4
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bernoulli(sigmoid(f)) observations from a dense SE GP draw
    (reference sample_bernoulli_gp, vanilla_gp_sampling.py:303-348)."""
    kf, kb = jax.random.split(key)
    d = 1 if x.ndim == 1 else x.shape[1]
    kern = SquaredExponential(lengthscale=lengthscale, variance=variance,
                              dimension=d)
    f = sample_gp_dense(kf, x, kern, noise_variance=noise_variance)
    y = jax.random.bernoulli(kb, jax.nn.sigmoid(f)).astype(f.dtype)
    return y, f


def sample_bernoulli_gp_spectral(key, x, *, lengthscale: float = 1.0,
                                 variance: float = 1.0,
                                 spectral_eps: float = 1e-4,
                                 trunc_eps: float = 1e-4
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bernoulli observations from the spectral prior sampler (reference
    sample_bernoulli_gp_spectral_approx, vanilla_gp_sampling.py:351-381).
    Scales to large n."""
    kf, kb = jax.random.split(key)
    f = sample_gp_spectral(kf, x, lengthscale=lengthscale, variance=variance,
                           spectral_eps=spectral_eps, trunc_eps=trunc_eps)
    y = jax.random.bernoulli(kb, jax.nn.sigmoid(f)).astype(f.dtype)
    return y, f


@partial(jax.jit, static_argnames=("mtot", "num_samples", "cg_tol",
                                   "max_cg_iter"))
def _pathwise_draw(x, y, ws, sigmasq, toeplitz, h, x_new, key, *,
                   mtot: int, num_samples: int, cg_tol: float,
                   max_cg_iter: int):
    n, d = x.shape
    rdtype = x.dtype
    cdtype = _cdtype(rdtype)
    M = ws.shape[0]
    kc_r, kc_i, ke = jax.random.split(key, 3)

    # prior draws with SHARED Fourier coefficients at data and targets
    cr = jax.random.normal(kc_r, (num_samples, M), dtype=rdtype)
    ci = jax.random.normal(kc_i, (num_samples, M), dtype=rdtype)
    coeffs = jax.lax.complex(cr, ci).astype(cdtype) / jnp.sqrt(2.0)
    wc = ws[None, :] * coeffs
    nufft_x = make_nufft(x, h, mtot, cdtype=cdtype)
    nufft_t = make_nufft(x_new, h, mtot, cdtype=cdtype)
    root2 = jnp.sqrt(2.0).astype(rdtype)
    f_x = root2 * nufft_x.type2(wc).real                      # (S, n)
    f_t = root2 * nufft_t.type2(wc).real                      # (S, n_new)

    # residuals with observation noise, solved in feature space
    eps = jnp.sqrt(sigmasq).astype(rdtype) * jax.random.normal(
        ke, (num_samples, n), dtype=rdtype)
    r = y[None, :] - f_x - eps                                # (S, n)
    rhs = ws[None, :] * nufft_x.type1(r.astype(cdtype)).reshape(
        num_samples, -1)
    A = make_A_mean(ws, toeplitz, sigmasq)
    res = pcg(A, rhs, tol=cg_tol, maxiter=max_cg_iter)
    update = nufft_t.type2(ws[None, :] * res.x).real
    return f_t + update, res.iters


def sample_posterior_pathwise(x, y, state, x_new, key, *,
                              num_samples: int = 16, cg_tol: float = 1e-6,
                              max_cg_iter: int = 1000):
    """Scalable posterior samples by Matheron's rule (pathwise update).

    ``f_post(x*) = f_prior(x*) + K(x*,X)(K + s2 I)^{-1}(y - f_prior(X) - e)``
    with the EFGP approximate prior ``K ~ F D^2 F*``: one spectral prior
    draw shared between data and targets (two type-2 NUFFTs), one batched
    feature-space CG per sample block, one type-2 update.  O(n M) per
    sample at ANY number of targets — the reference's ``sample_posterior``
    (efgpnd.py:974-1022) forms the dense n_new x n_new posterior Cholesky
    instead.  No reference analogue at scale.

    ``state`` is a ``FitState`` (carries ws/h/toeplitz/sigmasq); ``x``/``y``
    are the training data the state was fit on.  Returns
    ``(num_samples, n_new)`` samples of the approximate posterior.
    """
    x = x[:, None] if x.ndim == 1 else x
    x_new = x_new[:, None] if x_new.ndim == 1 else x_new
    samples, _ = _pathwise_draw(
        x, y, state.ws, state.sigmasq, state.toeplitz, state.h, x_new, key,
        mtot=state.mtot, num_samples=num_samples, cg_tol=cg_tol,
        max_cg_iter=max_cg_iter)
    return samples
