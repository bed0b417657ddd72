"""Host-f64 same-probe oracles for the benchmark accuracy loop.

Numpy-float64 replicas of the device estimators' EXACT algebra — the
batched hyper-gradient (models/gradient.py:94-241) and the Hutchinson
diag-sums variance (models/efgp._variance_stochastic) — consuming
explicitly passed probes, so a device-vs-oracle difference measures pure
arithmetic/solver error and not Hutchinson estimator variance.  This is
the missing piece of the "fit + variance + gradient at eps=1e-6
agreement" loop (VERDICT r2 #3); the reference runs the equivalent check
in torch float64 (reference verify_efgpnd_exact_small.py:152-196).

Dense O(M^2)-memory / O(M^3)-solve: benchmark-config sizes only
(SquaredExponential, the headline kernel).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["efgp_f64_objects", "gradient_f64", "stochastic_var_f64",
           "regular_var_f64", "pg_f64_objects", "pg_beta_mean_f64",
           "pg_mean_f64", "pg_var_f64"]


def _se_density(ell: float, var: float, d: int, xis: np.ndarray):
    nsq = np.sum(xis * xis, axis=1)
    return ((2.0 * np.pi * ell * ell) ** (d / 2.0) * var
            * np.exp(-2.0 * np.pi ** 2 * ell * ell * nsq))


def _se_dlength(ell: float, var: float, d: int, xis: np.ndarray):
    """dS/d(lengthscale) for the SE spectral density (matches
    kernels/squared_exponential.py:40-47 in f64)."""
    S = _se_density(ell, var, d, xis)
    nsq = np.sum(xis * xis, axis=1)
    return S * (d / ell - 4.0 * np.pi ** 2 * ell * nsq)


def efgp_f64_objects(x, y, ell, var, sigmasq, h, mtot: int) -> Dict:
    """Dense f64 EFGP objects on the same grid the device uses: design F,
    Gram T = F*F, operator A, mean solve, spectral derivative table."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n, d = x.shape
    m = (mtot - 1) // 2
    k1 = np.arange(-m, m + 1)
    K = np.stack(np.meshgrid(*([k1] * d), indexing="ij"), -1).reshape(-1, d)
    xis = (h * K).astype(np.float64)
    S = _se_density(ell, var, d, xis)
    ws = np.sqrt(S * h ** d)
    F = np.exp(2j * np.pi * (x @ xis.T))                    # (n, M)
    T = F.conj().T @ F
    M = T.shape[0]
    A = ws[:, None] * T * ws[None, :] + sigmasq * np.eye(M)
    Fy = F.conj().T @ y
    beta_raw = np.linalg.solve(A, ws * Fy)
    Dl = (h ** d) * _se_dlength(ell, var, d, xis)           # (M,)
    return dict(x=x, y=y, F=F, T=T, A=A, ws=ws, Fy=Fy, beta_raw=beta_raw,
                Dl=Dl, xis=xis, n=n, d=d, M=M, h=float(h), mtot=mtot,
                ell=float(ell), var=float(var), sigmasq=float(sigmasq))


def gradient_f64(obj: Dict, Z: np.ndarray, V: np.ndarray) -> np.ndarray:
    """Same-probe f64 replica of gradient_with_grid (SE kernel): returns
    the (3,) gradient over (lengthscale, variance, sigmasq)."""
    F, T, A = obj["F"], obj["T"], obj["A"]
    ws, Fy, beta_raw = obj["ws"], obj["Fy"], obj["beta_raw"]
    Dl, y = obj["Dl"], obj["y"]
    n, sigmasq, var = obj["n"], obj["sigmasq"], obj["var"]
    Z = np.asarray(Z, np.float64)
    V = np.asarray(V, np.float64)
    Tn = Z.shape[0]

    beta = ws * beta_raw
    alpha = (y.astype(complex) - F @ beta) / sigmasq
    fadj_alpha = (Fy - T @ beta) / sigmasq

    term2_l = np.real(np.vdot(fadj_alpha, Dl * fadj_alpha))
    alpha_norm = np.real(np.vdot(alpha, alpha))
    y_alpha = np.real(np.vdot(y.astype(complex), alpha))
    term2_v = (y_alpha - sigmasq * alpha_norm) / var
    term2 = np.array([term2_l, term2_v, alpha_norm])

    fadjZ = (F.conj().T @ Z.T).T                            # (T, M)
    Di_FZ = Dl[None, :] * fadjZ
    rhs_data = (F @ Di_FZ.T).T                              # (T, n)
    B_kernel = ws[None, :] * (T @ Di_FZ.T).T
    B_noise = ws[None, :] * (T @ (ws[None, :] * V).T).T
    B_all = np.concatenate([B_kernel, B_noise], axis=0)
    Beta_all = np.linalg.solve(A, B_all.T).T

    Beta_kernel = ws[None, :] * Beta_all[:Tn]
    fwdBeta = (F @ Beta_kernel.T).T
    Alpha = (rhs_data - fwdBeta) / sigmasq
    t1_l = np.mean(np.real(np.sum(Z * Alpha, axis=1)))
    Beta_noise = Beta_all[Tn:]
    t1_noise = (n / sigmasq
                - np.mean(np.real(np.sum(V.conj() * Beta_noise, axis=1))
                          / sigmasq))
    t1_v = (n - sigmasq * t1_noise) / var
    term1 = np.array([t1_l, t1_v, t1_noise])
    return 0.5 * (term1 - term2)


def stochastic_var_f64(obj: Dict, etas: np.ndarray,
                       x_new: np.ndarray) -> np.ndarray:
    """Same-probe f64 replica of the Hutchinson diag-sums variance
    (models/efgp._variance_stochastic; reference diag_sums_nd +
    nufft_var_est_nd, efgpnd.py:1634-1679)."""
    A, ws = obj["A"], obj["ws"]
    sigmasq, mtot, d, h = obj["sigmasq"], obj["mtot"], obj["d"], obj["h"]
    etas = np.asarray(etas, np.float64)
    P = etas.shape[0]
    rhs = ws[None, :] * etas
    U = np.linalg.solve(A / sigmasq, rhs.T).T
    gammas = ws[None, :] * U

    L = 2 * mtot - 1
    shape = (P,) + (mtot,) * d
    s_size = (L,) * d
    axes = tuple(range(1, d + 1))
    G = np.fft.fftn(gammas.reshape(shape), s=s_size, axes=axes)
    E = np.fft.fftn(etas.reshape(shape).astype(complex), s=s_size,
                    axes=axes)
    est = np.mean(np.fft.ifftn(G * np.conj(E), s=s_size, axes=axes), axis=0)

    k1 = np.fft.fftfreq(L, 1.0 / L)                         # FFT-order ints
    K = np.stack(np.meshgrid(*([k1] * d), indexing="ij"), -1).reshape(-1, d)
    phase = np.exp(2j * np.pi * (np.asarray(x_new, np.float64)
                                 @ (h * K).T))
    return np.real(phase @ est.reshape(-1))


def regular_var_f64(obj: Dict, x_new: np.ndarray) -> np.ndarray:
    """Exact per-target posterior variance in f64 (reference
    compute_prediction_variance 'regular' mode, efgpnd.py:1805-1820)."""
    A, ws, sigmasq = obj["A"], obj["ws"], obj["sigmasq"]
    Ft = np.exp(2j * np.pi * (np.asarray(x_new, np.float64)
                              @ obj["xis"].T))
    Z = np.linalg.solve(A / sigmasq, (ws * Ft.conj()).T).T
    return np.maximum(np.real(np.sum(Ft * (ws * Z), -1)), 0.0)


def pg_f64_objects(x, delta, kernel, h, mtot: int,
                   hm: int = None) -> Dict:
    """Dense f64 PG feature system for a fixed posterior ``delta``
    (reference pg_classifier.py:418-504 algebra; the same symmetrized
    system models/pg_core.dense_feature_system materializes in f32):

        T_w = F* diag(delta) F,   Ds = sqrt(max(ws2, eps_d)),
        A   = I + Ds T_w Ds.

    ``kernel`` is a gpquad kernel object (host-f64 spectral density via
    models/precision._spectral_density_np — SE or Matérn)."""
    from ..models.precision import _spectral_density_np
    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    delta = np.asarray(delta, np.float64)
    n, d = x.shape
    m = (mtot - 1) // 2
    k1 = np.arange(-m, m + 1)
    K = np.stack(np.meshgrid(*([k1] * d), indexing="ij"), -1).reshape(-1, d)
    xis = (float(h) * K).astype(np.float64)
    ws2 = _spectral_density_np(kernel, xis) * float(h) ** d
    if hm is not None and hm < m:
        # bucketed rung: surplus nodes carry exactly-zero weight, matching
        # the masked f32 fit (pg_core.build_pg_spectral_state ws_mask)
        ws2 = np.where(np.abs(K).max(-1) <= hm, ws2, 0.0)
    eps_d = max(float(np.mean(ws2)) * 1e-14, 1e-14)
    Ds = np.sqrt(np.maximum(ws2, eps_d))
    F = np.exp(2j * np.pi * (x @ xis.T))                    # (n, M)
    Tw = F.conj().T @ (delta[:, None] * F)
    M = Tw.shape[0]
    A = np.eye(M) + Ds[:, None] * Tw * Ds[None, :]
    return dict(x=x, F=F, A=A, ws2=ws2, Ds=Ds, xis=xis, n=n, d=d, M=M,
                h=float(h), mtot=mtot)


def pg_beta_mean_f64(obj: Dict, kappa: np.ndarray) -> np.ndarray:
    """f64 beta-mean: solve (I + Ds T_w Ds) z = Ds F* kappa, beta =
    Ds^{-1} z (reference _solve_beta_mean, pg_classifier.py:634-650)."""
    q = obj["F"].conj().T @ np.asarray(kappa, np.float64)
    z = np.linalg.solve(obj["A"], obj["Ds"] * q)
    return z / obj["Ds"]


def pg_mean_f64(obj: Dict, x_new: np.ndarray, beta: np.ndarray) -> np.ndarray:
    """f64 latent predictive mean Re[F_new (ws2 beta)] (reference
    _predictive_mean, pg_classifier.py:653-668)."""
    Ft = np.exp(2j * np.pi * (np.asarray(x_new, np.float64)
                              @ obj["xis"].T))
    return np.real(Ft @ (obj["ws2"] * beta))


def pg_var_f64(obj: Dict, x_new: np.ndarray) -> np.ndarray:
    """f64 exact latent variance: phi = conj rows; var =
    Re<conj(phi), ws2 Ds^{-1} z>, (I + Ds T_w Ds) z = Ds phi (reference
    _predictive_latent_moments, pg_classifier.py:671-739)."""
    Ds, ws2 = obj["Ds"], obj["ws2"]
    phi = np.exp(-2j * np.pi * (np.asarray(x_new, np.float64)
                                @ obj["xis"].T))            # (B, M)
    Z = np.linalg.solve(obj["A"], Ds[:, None] * phi.T)      # (M, B)
    e = ws2 / Ds
    return np.maximum(
        np.real(np.sum(phi.conj().T * (e[:, None] * Z), axis=0)), 0.0)


def efgp_f64_objects_kernel(x, y, kernel, sigmasq, h, mtot: int) -> Dict:
    """Kernel-generic :func:`efgp_f64_objects`: density and dS/dlengthscale
    come from the host-f64 formulas shared with the df64 tier
    (models/precision._spectral_density_np /
    models/gradient_high._spectral_dlength_np) — SE or Matérn, any nu."""
    from ..models.gradient_high import _spectral_dlength_np
    from ..models.precision import _spectral_density_np
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n, d = x.shape
    m = (mtot - 1) // 2
    k1 = np.arange(-m, m + 1)
    K = np.stack(np.meshgrid(*([k1] * d), indexing="ij"), -1).reshape(-1, d)
    xis = (h * K).astype(np.float64)
    S = _spectral_density_np(kernel, xis)
    ws = np.sqrt(S * h ** d)
    F = np.exp(2j * np.pi * (x @ xis.T))
    T = F.conj().T @ F
    M = T.shape[0]
    A = ws[:, None] * T * ws[None, :] + sigmasq * np.eye(M)
    Fy = F.conj().T @ y
    beta_raw = np.linalg.solve(A, ws * Fy)
    Dl = (h ** d) * _spectral_dlength_np(kernel, xis)
    return dict(x=x, y=y, F=F, T=T, A=A, ws=ws, Fy=Fy, beta_raw=beta_raw,
                Dl=Dl, xis=xis, n=n, d=d, M=M, h=float(h), mtot=mtot,
                ell=float(kernel.lengthscale), var=float(kernel.variance),
                sigmasq=float(sigmasq))
