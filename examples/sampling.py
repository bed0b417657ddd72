"""GP sampling walkthrough (script form of the reference's
``vanilla_gp_sampling.py`` demos): dense-Cholesky draws, the spectral
(EFGP-consistent) approximation sampler, Matérn draws, Bernoulli-GP
synthetic classification data, and posterior sampling through the fitted
EFGP model.

Run: ``python examples/sampling.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from gpquad.kernels import SquaredExponential
    from gpquad.models.model import EFGP
    from gpquad.models.sampling import (sample_bernoulli_gp_spectral,
                                        sample_gp_dense, sample_gp_matern,
                                        sample_gp_spectral)

    key = jax.random.PRNGKey(0)
    dtype = jnp.float64 if args.cpu else jnp.float32
    x = jnp.asarray(np.sort(np.random.default_rng(0).uniform(0, 1, 400)),
                    dtype)[:, None]
    kern = SquaredExponential(lengthscale=0.15, variance=1.0, dimension=1)

    # dense-Cholesky prior draw (the exact oracle sampler,
    # reference sample_gp_fast, vanilla_gp_sampling.py:100-150)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    y_dense = sample_gp_dense(k1, x, kern, noise_variance=0.01)
    print("dense draw:      mean %+.3f  sd %.3f"
          % (float(jnp.mean(y_dense)), float(jnp.std(y_dense))))

    # spectral approximation draw (complex-Gaussian Fourier coefficients
    # -> type-2 NUFFT, reference sample_gp_spectral_approx)
    y_spec = sample_gp_spectral(k2, x, lengthscale=0.15, variance=1.0)
    print("spectral draw:   mean %+.3f  sd %.3f"
          % (float(jnp.mean(y_spec)), float(jnp.std(y_spec))))

    # Matérn draw (reference sample_gp_matern)
    y_mat = sample_gp_matern(k3, x, nu=1.5, lengthscale=0.2,
                             noise_variance=0.01)
    print("matern32 draw:   mean %+.3f  sd %.3f"
          % (float(jnp.mean(y_mat)), float(jnp.std(y_mat))))

    # Bernoulli-GP synthetic classification data
    # (reference sample_bernoulli_gp_spectral_approx)
    labels, latent = sample_bernoulli_gp_spectral(k4, x, lengthscale=0.2,
                                                  variance=2.0)
    print("bernoulli draw:  positive rate %.2f"
          % float(jnp.mean(labels.astype(jnp.float32))))

    # posterior sampling through the fitted model
    # (reference EFGPND.sample_posterior, efgpnd.py:1170-1226)
    model = EFGP(x, y_spec, kern, sigmasq=0.01, eps=1e-4,
                 estimate_params=False)
    xq = jnp.linspace(0.1, 0.9, 50, dtype=dtype)[:, None]
    draws = model.sample_posterior(xq, 8, key=jax.random.PRNGKey(7))
    mu, _ = model.predict(xq, return_variance=False)
    spread = float(jnp.mean(jnp.std(draws, axis=1)))   # (targets, nsamples)
    err = float(jnp.max(jnp.abs(jnp.mean(draws, axis=1) - mu)))
    print(f"posterior draws: shape {tuple(draws.shape)}  "
          f"mean-vs-predict max dev {err:.3f}  avg sd {spread:.3f}")

    # pathwise (Matheron) posterior sampling — O(n M) per sample at any
    # number of targets, no dense target-space Cholesky (new; the
    # reference's sample_posterior is dense-only)
    from gpquad.models.sampling import sample_posterior_pathwise
    state = model.state
    S = 512
    pw = sample_posterior_pathwise(x, y_spec, state, xq,
                                   jax.random.PRNGKey(11), num_samples=S,
                                   cg_tol=1e-8)
    dev = float(jnp.max(jnp.abs(jnp.mean(pw, axis=0) - mu)))
    print(f"pathwise draws:  shape {tuple(pw.shape)}  "
          f"mean-vs-predict max dev {dev:.3f}  "
          f"avg sd {float(jnp.mean(jnp.std(pw, axis=0))):.3f}")
    assert dev < 0.2, "pathwise sample mean must track the posterior mean"


if __name__ == "__main__":
    main()
