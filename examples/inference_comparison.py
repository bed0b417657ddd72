"""Variational inference vs Polya-Gamma Gibbs sampling: same posterior.

Script form of the reference's
polyagamma_classification/CAVI_NaturalGrad_Gibbs_test.ipynb, which checks
that three inference schemes for the Polya-Gamma logistic model agree:
coordinate-ascent VI (CAVI), natural-gradient SVI, and a PG Gibbs sampler.

Here the model under test is gpquad's :class:`PolyagammaGPClassifier`
(damped CAVI fixed point with Hutchinson Sigma-diagonal probes, the
production TPU path), and the two oracles are built in numpy float64 on
the SAME quadrature-approximated kernel the classifier uses:

  K_approx(x, x') = sum_j ws2_j cos(2 pi (x - x') xi_j)

realised exactly by the real feature map

  Phi(x) = [ sqrt(ws2_j) cos(2 pi x xi_j), sqrt(ws2_j) sin(2 pi x xi_j) ]

with weights a ~ N(0, I); f = Phi a then has covariance K_approx, so all
three inferences target the *identical* posterior and any disagreement is
inference error, not model error:

  1. dense CAVI   — the notebook's `cavi()` fixed point with the exact
     Sigma diagonal (no Hutchinson noise), run to convergence;
  2. PG Gibbs     — the notebook's `gibbs_pg()`: omega | f ~ PG(1, f) by
     the truncated Polson-Scott-Windle series, a | omega a Gaussian
     conditional via one Cholesky per sweep (MCMC ground truth);
  3. gpquad VI    — PolyagammaGPClassifier.fit with lr=0 (hypers frozen,
     so the model matches the oracles' kernel exactly).

Checks: the three latent posterior means agree, the CAVI/Gibbs latent
variances agree, and E[omega] vectors agree.

Run: ``python examples/inference_comparison.py [--cpu]``
(--cpu runs the classifier in float64 and tightens the VI-vs-CAVI
tolerance; the oracles are float64 either way.)
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

# hoisted: jit-inside-a-function-body recompiles per call (~0.3 s on axon);
# jax.jit is lazy, so constructing it before main()'s platform config is safe
_real = jax.jit(jnp.real)


def dense_cavi(Phi, y, max_iter=200, tol=1e-10):
    """Notebook `cavi()` (cells 2): exact-Sigma PG coordinate ascent."""
    import numpy as np
    n, m = Phi.shape
    d = np.full(n, 0.25)
    kappa = y - 0.5
    for _ in range(max_iter):
        precision = (Phi.T * d) @ Phi + np.eye(m)
        Sigma = np.linalg.inv(precision)
        mu = Sigma @ (Phi.T @ kappa)
        s_phi = np.sum(Phi * (Phi @ Sigma), axis=1)
        c = np.sqrt(s_phi + (Phi @ mu) ** 2)
        d_new = np.where(c > 1e-8, 0.5 * np.tanh(c / 2) / np.maximum(c, 1e-8),
                         0.25)
        if np.linalg.norm(d_new - d) < tol:
            d = d_new
            break
        d = d_new
    return mu, Sigma, d


def pg_draw(rng, c, terms=100):
    """omega ~ PG(1, c) via the truncated Polson-Scott-Windle sum
    (notebook `pgdraw_vec`): omega = (1/2 pi^2) sum_k g_k / ((k-1/2)^2 +
    c^2/(4 pi^2)), g_k ~ Gamma(1, 1).

    The raw 100-term truncation underestimates E[omega] by the series
    tail, ~1/(2 pi^2 terms) ~ 5e-4 absolute (~0.2% relative at c=0); the
    analytic tail mean E[PG(1,c)] - E[truncated] = tanh(c/2)/(2c) -
    (1/2 pi^2) sum_{k<=terms} 1/denom_k is folded back in so the sampler
    mean is exact (tail variance ~ terms^-3 stays negligible)."""
    import numpy as np
    c = np.abs(np.asarray(c))
    k = np.arange(1, terms + 1)[:, None]
    denom = (k - 0.5) ** 2 + (c[None, :] / (2 * np.pi)) ** 2
    g = rng.gamma(1.0, 1.0, size=(terms, c.size))
    exact_mean = np.where(c > 1e-8,
                          np.tanh(c / 2) / (2 * np.maximum(c, 1e-8)), 0.25)
    trunc_mean = (1.0 / denom).sum(axis=0) / (2 * np.pi ** 2)
    return (g / denom).sum(axis=0) / (2 * np.pi ** 2) + (exact_mean
                                                         - trunc_mean)


def gibbs_pg(rng, Phi, y, n_iter=2500, burn=800, terms=100):
    """Notebook `gibbs_pg()`: blocked Gibbs on (a, omega) in weight space,
    one Cholesky + two triangular solves per sweep."""
    import numpy as np
    from scipy.linalg import cholesky, solve_triangular
    # keep burn < n_iter for any user --gibbs-iters (kept=0 otherwise);
    # default n_iter=2500 still burns the notebook's 800
    burn = min(burn, n_iter // 3)
    n, m = Phi.shape
    a = np.zeros(m)
    kappa = Phi.T @ (y - 0.5)
    f_sum = np.zeros(n)
    f2_sum = np.zeros(n)
    om_sum = np.zeros(n)
    kept = 0
    for it in range(n_iter):
        omega = pg_draw(rng, Phi @ a, terms=terms)
        precision = (Phi.T * omega) @ Phi + np.eye(m)
        L = cholesky(precision, lower=True)
        mu = solve_triangular(L.T, solve_triangular(L, kappa, lower=True),
                              lower=False)
        a = mu + solve_triangular(L.T, rng.standard_normal(m), lower=False)
        if it >= burn:
            f = Phi @ a
            f_sum += f
            f2_sum += f * f
            om_sum += omega
            kept += 1
    f_mean = f_sum / kept
    f_var = f2_sum / kept - f_mean ** 2
    return f_mean, f_var, om_sum / kept


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--gibbs-iters", type=int, default=2500)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from gpquad import PolyagammaGPClassifier
    from gpquad.models.sampling import sample_bernoulli_gp_spectral

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(-1, 1, size=(args.n, 1)), axis=0)
    ell, sf2 = 0.25, 2.0
    yb, _ = sample_bernoulli_gp_spectral(jax.random.PRNGKey(0),
                                         jnp.asarray(X, jnp.float32),
                                         lengthscale=ell, variance=sf2)
    y = np.asarray(yb).astype(float)

    # --- gpquad VI, hypers frozen at the truth (lr=0) so the model equals
    # the oracles' kernel exactly
    clf = PolyagammaGPClassifier(
        max_iter=40, lr=0.0, lengthscale_init=ell, variance_init=sf2,
        n_e_probes=64, random_state=0,
        dtype="float64" if args.cpu else "float32")
    clf.fit(X, y.astype(int))
    f_vi = np.asarray(clf.posterior_mean_, dtype=np.float64)
    om_vi = np.asarray(clf.delta_, dtype=np.float64)

    # --- shared feature map from the classifier's own spectral state
    sp = clf._spectral_state_
    mtot, h = sp.mtot, float(np.asarray(sp.h))
    m = (mtot - 1) // 2
    xis = np.arange(-m, m + 1, dtype=np.float64) * h
    # axon cannot transfer complex arrays host<->device: take the real part
    # on-device (inside jit) before pulling ws2 to the host
    w = np.sqrt(np.asarray(_real(sp.ws2), dtype=np.float64))
    ang = 2 * np.pi * X.astype(np.float64) * xis[None, :]
    Phi = np.concatenate([w * np.cos(ang), w * np.sin(ang)], axis=1)
    print(f"model: n={args.n} mtot={mtot} features={Phi.shape[1]} "
          f"(kernel realised exactly by the real Fourier feature map)")

    # --- oracle 1: dense CAVI (exact Sigma diagonal, run to fixed point)
    mu, Sigma, om_cavi = dense_cavi(Phi, y)
    f_cavi = Phi @ mu
    v_cavi = np.sum(Phi * (Phi @ Sigma), axis=1)

    # --- oracle 2: PG Gibbs ground truth
    f_gibbs, v_gibbs, om_gibbs = gibbs_pg(
        np.random.default_rng(1), Phi, y, n_iter=args.gibbs_iters)

    scale = float(np.sqrt(np.mean(f_cavi ** 2)))

    def rel_rms(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2))) / scale

    r_vi = rel_rms(f_vi, f_cavi)
    r_gb = rel_rms(f_gibbs, f_cavi)
    corr = float(np.corrcoef(f_gibbs, f_cavi)[0, 1])
    v_ratio = float(np.median(v_gibbs / np.maximum(v_cavi, 1e-12)))
    d_om_vi = float(np.max(np.abs(om_vi - om_cavi)))
    d_om_gb = float(np.max(np.abs(om_gibbs - om_cavi)))

    print(f"latent mean  rel-RMS: VI vs dense CAVI {r_vi:.2e}   "
          f"Gibbs vs dense CAVI {r_gb:.2e}  (corr {corr:.4f})")
    print(f"latent var   median Gibbs/CAVI ratio {v_ratio:.3f} "
          f"(VI underestimates marginals; ratio ~1 => agreement)")
    print(f"E[omega]     max|VI-CAVI| {d_om_vi:.2e}   "
          f"max|Gibbs-CAVI| {d_om_gb:.2e}")

    tol_vi = 2e-2 if args.cpu else 5e-2
    assert r_vi < tol_vi, (r_vi, tol_vi)
    assert r_gb < 0.15 and corr > 0.99, (r_gb, corr)
    assert 0.8 < v_ratio < 1.3, v_ratio
    assert d_om_vi < 0.05 and d_om_gb < 0.05, (d_om_vi, d_om_gb)
    print("PASS: damped-Hutchinson VI, exact CAVI, and PG Gibbs agree on "
          "the same posterior")


if __name__ == "__main__":
    main()
