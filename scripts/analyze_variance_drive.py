"""Diagnose the late-training sigma_f^2 gradient drive.

Port of the reference's PRISM variance-drive pathology check
(reference: analyze_prism_variance_drive.py:1-370): for frozen
"late-training" hyper states — small lengthscale, large signal variance,
small noise, the regime where the reference observed suspicious
sigma_f^2 gradients — compare

  1. the exact formed-MxM raw gradient of the approximate EFGP objective
     0.5 (N - sigma^2 tr(K~_n^{-1}) - y^T alpha + sigma^2 alpha^T alpha),
  2. central finite differences of that exact objective in log sigma_f^2,
  3. ``gradient()`` (the production estimator) at several cg_tol values,
  4. an exact objective scan over sigma_f^2 factors (is the drive real?).

on the frozen committed raster.  PASS: exact-vs-FD relative error < 1e-5
and the tight-cg_tol estimator within 15% relative of exact (the trace
term is stochastic; 64 probes on n=1000 concentrates well below that).
The loose-tolerance rows document how much CG bias alone moves the
gradient — the reference's headline finding.

Run: ``python scripts/analyze_variance_drive.py``
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

from gpquad.kernels import SquaredExponential
from gpquad.models.gradient import gradient
from gpquad.quadrature import spectral_grid

DATA = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"


def exact_bundle(x, y, lengthscale, variance, sigmasq, eps):
    """Dense feature-space ground truth (reference build_exact_bundle,
    analyze_prism_variance_drive.py:128-240)."""
    n, d = x.shape
    kern = SquaredExponential(lengthscale=lengthscale, variance=variance,
                              dimension=d)
    L = float(np.max(x.max(0) - x.min(0)))
    _, h, mtot = spectral_grid(kern, eps, L, use_integral=True)
    h = float(h)
    m = (mtot - 1) // 2
    xi1 = np.arange(-m, m + 1) * h
    mesh = np.stack(np.meshgrid(*([xi1] * d), indexing="ij"),
                    -1).reshape(-1, d)
    M = mesh.shape[0]
    s = np.asarray(kern.spectral_density(jnp.asarray(mesh))) * h**d
    ws = np.sqrt(s)
    F = np.exp(2j * np.pi * x @ mesh.T)
    C = F.conj().T @ F
    G = (ws[:, None] * C) * ws[None, :]
    A = G + sigmasq * np.eye(M)
    b = ws * (F.conj().T @ y)
    beta = np.linalg.solve(A, b)
    yty = float(y @ y)
    b_beta = float(np.real(np.vdot(b, beta)))
    y_alpha = (yty - b_beta) / sigmasq
    alpha_norm = (yty - 2.0 * b_beta
                  + float(np.real(np.vdot(beta, G @ beta)))) / sigmasq**2
    noise_trace = n / sigmasq - np.trace(np.linalg.solve(A, G)).real / sigmasq
    raw_grad_exact = 0.5 * (n - sigmasq * noise_trace - y_alpha
                            + sigmasq * alpha_norm)

    def objective_at_factor(factor):
        # G and b scale linearly / by sqrt in the signal variance, so
        # variance v*factor has Gram factor*G and rhs sqrt(factor)*b
        Af = factor * G + sigmasq * np.eye(M)
        bf = np.sqrt(factor) * b
        betaf = np.linalg.solve(Af, bf)
        ya = (yty - float(np.real(np.vdot(bf, betaf)))) / sigmasq
        sign, logdet = np.linalg.slogdet(Af)
        assert sign.real > 0
        return 0.5 * ((n - M) * np.log(sigmasq) + logdet.real + ya
                      + n * np.log(2 * np.pi))

    return dict(n=n, M=M, mtot=mtot, kern=kern,
                raw_grad_exact=float(raw_grad_exact),
                objective_at_factor=objective_at_factor)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--eps", type=float, default=1e-4)
    args = ap.parse_args()
    blob = np.load(DATA)
    x = blob["x_train"][:args.n]
    y = blob["y_train"][:args.n]

    # frozen states mirroring the reference's late-PRISM pathology regime
    # (small l / large sigma_f^2 / small sigma^2) plus a benign one
    states = [("late-pathology", 0.085, 3.9, 0.052),
              ("benign", 0.15, 1.0, 0.10)]
    cg_tols = [1e-4, 1e-6, 1e-9]
    fails = []
    for label, l, v, s2 in states:
        bd = exact_bundle(x, y, l, v, s2, args.eps)
        # finite differences in raw (log) variance
        dlt = 1e-5
        fd = (bd["objective_at_factor"](np.exp(dlt))
              - bd["objective_at_factor"](np.exp(-dlt))) / (2 * dlt)
        rel_fd = abs(fd - bd["raw_grad_exact"]) / max(
            abs(bd["raw_grad_exact"]), 1e-12)
        print(f"== {label}: l={l} var={v} sigmasq={s2}  "
              f"(n={bd['n']} M={bd['M']})")
        print(f"  exact raw grad = {bd['raw_grad_exact']:+.6e}   "
              f"finite-diff = {fd:+.6e}   rel = {rel_fd:.2e}")
        if rel_fd > 1e-5:
            fails.append(f"{label}-fd")

        kern = bd["kern"]
        # solver="dense" is the production default at this M (factor-solve,
        # tolerance-insensitive); solver="cg" exposes the reference's
        # loose-cg_tol gradient bias (analyze_prism_variance_drive.py:9)
        for solver in ("dense", "cg"):
            for tol in cg_tols:
                res = gradient(jnp.asarray(x), jnp.asarray(y), kern, s2,
                               args.eps, jax.random.PRNGKey(0),
                               trace_samples=64, cg_tol=tol, solver=solver)
                gpos = np.asarray(res.grad)
                raw_var = float(gpos[1] * v)    # chain rule to log space
                rel = abs(raw_var - bd["raw_grad_exact"]) / max(
                    abs(bd["raw_grad_exact"]), 1e-12)
                print(f"  gradient() solver={solver} cg_tol={tol:g}: "
                      f"raw grad_var={raw_var:+.6e}  rel={rel:.3f}  "
                      f"(mean_cg={int(res.mean_cg_iters)}, "
                      f"trace_cg={int(res.trace_cg_iters)})")
                if tol <= 1e-9 and rel > 0.15:
                    fails.append(f"{label}-{solver}-tight-tol")

        # objective scan: which direction does the exact objective drive?
        scan = [(f, bd["objective_at_factor"](f))
                for f in (0.5, 0.75, 1.0, 1.25, 1.5, 2.0)]
        base = scan[2][1]
        drive = " ".join(f"{f:g}:{nll - base:+.3f}" for f, nll in scan)
        print(f"  exact NLL scan vs variance factor: {drive}")

    print("PASS" if not fails else f"FAIL: {fails}")
    sys.exit(0 if not fails else 1)


if __name__ == "__main__":
    main()
