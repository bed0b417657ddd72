"""SLQ trace estimators demo: tr(A^{-1}), logdet, tr(A^{-1}B) by matvecs.

Script form of the reference's polyagamma_classification/SLQ_trace.ipynb:
(1) the notebook's dummy low-rank-plus-identity problem, validating
    slq_trace_f (f = 1/x and f = log) and the auto-h finite-difference
    tr(A^{-1}B) estimator against dense ground truth;
(2) an EFGP tie-in the notebook gestures at: with the feature-space mean
    operator A = I + sigma^-2 D T D, the lengthscale trace term
    tr(A^{-1} dA/dl) = d/dl log det A is estimated with matvecs only and
    checked against the densely-formed operator.

Run: ``python scripts/slq_trace_demo.py`` (CPU x64).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit
from gpquad.ops.slq import power_iteration, slq_trace_f, trace_ainv_b_fd


def dummy_problem(rng, n=1000, M=6):
    """SLQ_trace.ipynb dummy-problem cell: A = I + W W', B = W J' + J W'."""
    F = rng.normal(size=(n, M)) / np.sqrt(n)
    W = F * np.exp(np.linspace(0, 2.0, M))
    A = np.eye(n) + W @ W.T + 1e-8 * np.eye(n)
    J = F * np.exp(np.linspace(0, 1.5, M))
    B = W @ J.T + J @ W.T
    return jnp.asarray(A), jnp.asarray(B)


def main():
    rng = np.random.default_rng(123)

    print("== part 1: notebook dummy problem (n=1000, rank 6) ==")
    A, B = dummy_problem(rng)
    n = A.shape[0]
    Ad, Bd = np.asarray(A), np.asarray(B)
    true_tr_inv = float(np.trace(np.linalg.inv(Ad)))
    _, true_logdet = np.linalg.slogdet(Ad)
    true_tr_ainvb = float(np.trace(np.linalg.solve(Ad, Bd)))

    key = jax.random.PRNGKey(0)
    norm = float(power_iteration(lambda v: A @ v, key, n, dtype=jnp.float64))
    print(f"||A||_2 ~ {norm:.4f}  (dense {np.linalg.eigvalsh(Ad).max():.4f})")

    est_inv = float(slq_trace_f(lambda v: A @ v, key, n, probes=16, steps=20,
                                dtype=jnp.float64))
    est_ld = float(slq_trace_f(lambda v: A @ v, key, n, probes=256, steps=20,
                               f=jnp.log, dtype=jnp.float64))
    est_ab, h = trace_ainv_b_fd(lambda v: A @ v, lambda v: B @ v, key, n,
                                probes=64, steps=20, dtype=jnp.float64)
    rows = [("tr(A^-1)      ", est_inv, true_tr_inv),
            ("log det A     ", est_ld, true_logdet),
            ("tr(A^-1 B)    ", float(est_ab), true_tr_ainvb)]
    for tag, est, want in rows:
        rel = abs(est - want) / max(abs(want), 1e-12)
        print(f"{tag} SLQ {est:12.4f}   dense {want:12.4f}   rel {rel:.2%}")
        assert rel < 0.10, (tag, est, want)
    print(f"auto-h step: {float(h):.3e}")

    print("\n== part 2: EFGP feature-space lengthscale trace ==")
    x = jnp.asarray(rng.uniform(0, 1, size=(400, 1)))
    y = jnp.sin(6 * x[:, 0]) + 0.2 * jnp.asarray(rng.normal(size=400))
    ell, sigmasq = 0.12, 0.05
    kern = SquaredExponential(lengthscale=ell, variance=1.0, dimension=1)
    state = fit(x, y, kern, sigmasq, eps=1e-4, cg_tol=1e-10)
    M = state.ws.shape[0]
    ws = state.ws.real                      # SE weights are real-positive
    # d(ws)/dl from the analytic spectral gradient: ws^2 = S h^d so
    # dws/dl = (h^d dS/dl) / (2 ws)  (gradient.py builds the same Dprime)
    m = (M - 1) // 2
    xis = (jnp.arange(-m, m + 1) * state.h)[:, None]
    dws2 = (state.h * kern.spectral_grad(xis)[:, 0]).real
    dws = dws2 / (2 * ws)

    def T_real(v):
        return state.toeplitz(v.astype(state.ws.dtype)[None, :])[0].real

    def A_apply(v):
        return v + ws * T_real(ws * v) / sigmasq

    def B_apply(v):                          # dA/dl, symmetric
        return (dws * T_real(ws * v) + ws * T_real(dws * v)) / sigmasq

    est, h = trace_ainv_b_fd(A_apply, B_apply, jax.random.PRNGKey(1), M,
                             probes=64, steps=30, dtype=jnp.float64)
    # dense ground truth from the explicitly-formed operator
    T_dense = np.asarray(state.toeplitz(jnp.eye(M, dtype=state.ws.dtype))).real
    wsn, dwsn = np.asarray(ws), np.asarray(dws)
    A_d = np.eye(M) + (wsn[:, None] * T_dense * wsn[None, :]) / sigmasq
    B_d = (dwsn[:, None] * T_dense * wsn[None, :]
           + wsn[:, None] * T_dense * dwsn[None, :]) / sigmasq
    want = float(np.trace(np.linalg.solve(A_d, B_d)))
    rel = abs(float(est) - want) / abs(want)
    print(f"tr(A^-1 dA/dl) SLQ-FD {float(est):12.4f}   dense {want:12.4f}"
          f"   rel {rel:.2%}   (M={M}, h={float(h):.2e})")
    assert rel < 0.10, (float(est), want)
    print("PASS: slq trace demo")


if __name__ == "__main__":
    main()
