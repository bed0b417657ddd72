"""Evaluate lengthscale-gradient trace estimators against exact ground truth.

Port of the reference's two estimator-evaluation scripts
(reference: evaluate_lengthscale_split_estimator.py:1 and
evaluate_lengthscale_objective_feature_estimator.py:1) on synthetic
stand-ins for the usa_temp subsets.  Four estimators of the lengthscale
term1 trace / gradient are compared, probe-for-probe, against the exact
dense value of the same approximate EFGP objective:

  1. old       — data-space Hutchinson z^T K~^{-1} dK~ z (the production
                 estimator's algebra, efgpnd.py:175-220)
  2. rewrite   — full feature-space trace rewrite:
                 trace_const - v^T A^{-1} H_full v / sigma^2,
                 H_full = D C S' C D (algebraically exact, higher variance)
  3. split     — exact-scale + PSD residual: d(w^2)/dl = c_l w^2 - q_l with
                 q_l >= 0, so term1 = c_l (n - sigma^2 tr(K~^{-1}))
                 - trace_q_const + v^T A^{-1} H_psd v / sigma^2
                 (reference evaluate_lengthscale_split_estimator.py:311-316)
  4. objective — whole-objective feature-space derivative
                 0.5 [tr(A^{-1} A_l) - sigma^{-2}(2 Re(b_l^* beta)
                 - beta^* A_l beta)], A_l = E G + G E,
                 E = diag(0.5 dlog(w^2)/dl)
                 (reference evaluate_lengthscale_objective_feature_estimator.py:7-14)

PASS criteria: the exact identities agree to 1e-8 relative, and every
estimator's sample mean lies within 5 standard errors of the exact value.
The per-estimator standard deviations quantify the variance reduction the
split buys.  Run: ``python scripts/evaluate_lengthscale_estimators.py``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import Matern, SquaredExponential
from gpquad.quadrature import spectral_grid
from gpquad.utils.loaders import load_synthetic_gp


def make_bundle(kernel, x, y, sigmasq, eps):
    """Dense ground-truth bundle (reference make_bundle,
    evaluate_lengthscale_split_estimator.py:147-275)."""
    n, d = x.shape
    L = float(np.max(x.max(0) - x.min(0)))
    _, h, mtot = spectral_grid(kernel, eps, L)
    h = float(h)
    m = (mtot - 1) // 2
    xi1 = np.arange(-m, m + 1) * h
    mesh = np.stack(np.meshgrid(*([xi1] * d), indexing="ij"),
                    -1).reshape(-1, d)
    M = mesh.shape[0]
    s = np.asarray(kernel.spectral_density(jnp.asarray(mesh))) * h**d
    d_l = np.asarray(kernel.spectral_grad(jnp.asarray(mesh)))[:, 0] * h**d
    ws = np.sqrt(s)

    F = np.exp(2j * np.pi * x @ mesh.T)            # (n, M)
    C = F.conj().T @ F                             # Gram F*F
    D = np.diag(ws)
    G = D @ C @ D
    A = G + sigmasq * np.eye(M)
    K = np.real((F * s[None, :]) @ F.conj().T)     # K~ = F S' F*
    dK = np.real((F * d_l[None, :]) @ F.conj().T)

    ratio = d_l / np.maximum(s, 1e-300)
    c_psd = float(ratio.max())
    q_psd = c_psd * s - d_l
    assert q_psd.min() > -1e-10 * max(abs(d_l).max(), 1.0)

    Ainv = np.linalg.inv(A)
    noise_trace = n / sigmasq - np.trace(Ainv @ G).real / sigmasq
    H_full = D @ C @ np.diag(d_l) @ C @ D
    H_psd = D @ C @ np.diag(q_psd) @ C @ D
    trace_full_const = float((np.diagonal(C).real * d_l).sum() / sigmasq)
    trace_psd_const = float((np.diagonal(C).real * q_psd).sum() / sigmasq)
    term1_exact = trace_full_const - np.trace(Ainv @ H_full).real / sigmasq
    exact_scale = c_psd * (n - sigmasq * noise_trace) - trace_psd_const
    term1_split_exact = exact_scale + np.trace(Ainv @ H_psd).real / sigmasq
    # data-space check: term1 == tr(K~_n^{-1} dK~)
    B_old = np.linalg.solve(K + sigmasq * np.eye(n), dK)
    term1_data = float(np.trace(B_old))

    b = ws * (F.conj().T @ y)
    beta = np.linalg.solve(A, b)
    fadj_alpha = (F.conj().T @ y - C @ (ws * beta)) / sigmasq
    term2_exact = float(np.real(np.vdot(fadj_alpha, d_l * fadj_alpha)))
    grad_exact = 0.5 * (term1_exact - term2_exact)

    # whole-objective feature-space pieces
    e_diag = 0.5 * d_l / np.maximum(s, 1e-300)
    A_l = (np.diag(e_diag * s) @ C @ D * 1.0)      # E G with E diag
    E = np.diag(e_diag)
    A_l = E @ G + G @ E
    b_l = e_diag * b
    obj_exact = 0.5 * (np.trace(Ainv @ A_l).real
                       - (2.0 * np.real(np.vdot(b_l, beta))
                          - np.real(np.vdot(beta, A_l @ beta))) / sigmasq)

    return dict(n=n, M=M, mtot=mtot, sigmasq=sigmasq, ws=ws, s=s, d_l=d_l,
                c_psd=c_psd, q_psd=q_psd, C=C, A=A, G=G, K=K, dK=dK,
                B_old=B_old, H_full=H_full, H_psd=H_psd,
                trace_full_const=trace_full_const,
                trace_psd_const=trace_psd_const, exact_scale=exact_scale,
                noise_trace=noise_trace, term1_exact=float(term1_exact),
                term1_split_exact=float(term1_split_exact),
                term1_data=term1_data, term2_exact=term2_exact,
                grad_exact=float(grad_exact), obj_exact=float(obj_exact),
                beta=beta, b=b, b_l=b_l, A_l=A_l, e_diag=e_diag)


def rademacher(key, shape):
    return np.asarray(jax.random.bernoulli(key, 0.5, shape) * 2 - 1,
                      np.float64)


def sample_estimators(bd, num_samples, key):
    Z = rademacher(jax.random.fold_in(key, 0), (num_samples, bd["n"]))
    V = rademacher(jax.random.fold_in(key, 1), (num_samples, bd["M"]))
    out = {}
    out["old"] = np.einsum("ij,ij->i", Z @ bd["B_old"].T, Z)
    Ainv_Hf = np.linalg.solve(bd["A"], bd["H_full"])
    out["rewrite"] = bd["trace_full_const"] - np.real(
        np.einsum("ij,ij->i", V.conj() @ Ainv_Hf.T, V)) / bd["sigmasq"]
    Ainv_Hp = np.linalg.solve(bd["A"], bd["H_psd"])
    out["split"] = bd["exact_scale"] + np.real(
        np.einsum("ij,ij->i", V.conj() @ Ainv_Hp.T, V)) / bd["sigmasq"]
    # whole-objective: stochastic tr(A^{-1} A_l) + exact quadratic pieces
    Ainv_Al = np.linalg.solve(bd["A"], bd["A_l"])
    quad = (2.0 * np.real(np.vdot(bd["b_l"], bd["beta"]))
            - np.real(np.vdot(bd["beta"], bd["A_l"] @ bd["beta"])))
    out["objective"] = 0.5 * (np.real(
        np.einsum("ij,ij->i", V.conj() @ Ainv_Al.T, V)) - quad / bd["sigmasq"])
    return out


def report(label, bd, samples):
    fails = []
    rel = lambda a, b: abs(a - b) / max(abs(b), 1e-12)
    print(f"== {label}: n={bd['n']} M={bd['M']} mtot={bd['mtot']}")
    ident1 = rel(bd["term1_exact"], bd["term1_split_exact"])
    ident2 = rel(bd["term1_exact"], bd["term1_data"])
    print(f"  exact identities: full-vs-split rel={ident1:.2e}  "
          f"feature-vs-data rel={ident2:.2e}")
    if ident1 > 1e-8 or ident2 > 1e-6:
        fails.append("exact-identity")
    for name, vals in samples.items():
        exact = (bd["grad_exact"] if name == "objective"
                 else bd["term1_exact"])
        mean, sd = float(vals.mean()), float(vals.std(ddof=1))
        se = sd / np.sqrt(len(vals))
        z = abs(mean - exact) / max(se, 1e-12)
        print(f"  {name:>9}: mean={mean:+.6e}  exact={exact:+.6e}  "
              f"sd={sd:.3e}  |z|={z:.2f}")
        if z > 5.0:
            fails.append(name)
    if samples["split"].std() > samples["rewrite"].std():
        print("  note: split variance not lower than rewrite on this case")
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--samples", type=int, default=1000)
    args = ap.parse_args()
    key = jax.random.PRNGKey(1234)

    xh, yh = load_synthetic_gp(n=args.n, d=2, lengthscale=0.1, variance=2.0,
                               noise=0.15, seed=0, spectral=False)
    x, y = np.asarray(xh, np.float64), np.asarray(yh, np.float64)

    fails = []
    se = SquaredExponential(lengthscale=0.09, variance=4.0, dimension=2)
    bd = make_bundle(se, x, y, sigmasq=0.03, eps=1e-4)
    fails += report("SE small dense check", bd,
                    sample_estimators(bd, args.samples, key))

    # Matérn tails are heavy: eps=1e-3 keeps M ~ 1e3 so the dense M x M
    # ground truth stays tractable (the reference's small checks balance
    # the same way, evaluate_lengthscale_split_estimator.py:460-478)
    mat = Matern(lengthscale=0.22, variance=2.5, dimension=2, nu=1.5)
    bd = make_bundle(mat, x, y, sigmasq=0.04, eps=1e-3)
    fails += report("Matern small dense check", bd,
                    sample_estimators(bd, args.samples,
                                      jax.random.fold_in(key, 7)))

    print("PASS" if not fails else f"FAIL: {fails}")
    sys.exit(0 if not fails else 1)


if __name__ == "__main__":
    main()
