"""Polya-Gamma variational GP core (component C15, functional layer).

TPU-native re-design of the reference's PG-augmented GP machinery
(reference: polyagamma_classification/pg_classifier.py:29-1055).  The same
EFGP structured-operator core is reused; what is specific to the PG model:

  - the *weighted* Gram operator ``F* diag(Delta) F`` — another multilevel
    Toeplitz matrix whose lag table is one type-1 NUFFT of Delta
    (pg_classifier.py:377-384);
  - a damped fixed point on the diagonal PG variational parameters Delta,
    with Hutchinson probes estimating diag(Sigma) (pg_classifier.py:507-582);
  - a symmetrized feature-space solver ``(I + Ds F* Omega F Ds)`` used by
    the M-step, the beta-mean solve and every predictive-variance mode
    (pg_classifier.py:439-504);
  - Bernoulli and Negative-Binomial Polya-Gamma likelihoods, the
    logistic-Gaussian moment approximation and the Gauss-Hermite
    total-count gradient (pg_classifier.py:84-258).

All stochastic pieces take explicit PRNG keys; heavy passes are jitted with
static grid sizes so the EM loop does not recompile as hypers move.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cg import pcg
from ..ops.dense_solve import (DENSE_SOLVER_MAX_M, dense_inverse,
                               dense_toeplitz, refine_solve)
from ..ops.nufft import NUFFT, make_nufft
from ..ops.operators import convolution_vector
from ..ops.toeplitz import ToeplitzND, make_toeplitz, toeplitz_diag_scale
from .efgp import _cdtype, tensor_grid

__all__ = [
    "PGSpectralState", "build_pg_spectral_state", "weighted_toeplitz",
    "pg_omega_expectation", "approximate_logistic_gaussian_prob",
    "negative_binomial_gaussian_mean", "expected_log_sigmoid_neg_gaussian",
    "negative_binomial_total_count_gradient",
    "estep_pass", "mstep_gradient", "solve_beta_mean",
    "outer_step", "OuterStepResult",
    "predictive_mean", "predictive_variance_exact",
    "predictive_variance_exact_batched",
    "dense_feature_system", "predictive_variance_exact_dense",
    "stochastic_variance_sums", "evaluate_variance_sums",
    "chebyshev_lobatto_nodes", "barycentric_matrix",
    "predictive_variance_chebyshev",
]


# ---------------------------------------------------------------------------
# likelihood math
# ---------------------------------------------------------------------------

def approximate_logistic_gaussian_prob(mean, variance=None):
    """E[sigmoid(F)] for Gaussian F via sigmoid(m / sqrt(1 + pi v / 8))
    (reference pg_classifier.py:173-191)."""
    if variance is None:
        return jax.nn.sigmoid(mean)
    safe = jnp.maximum(variance, 0.0)
    return jax.nn.sigmoid(mean / jnp.sqrt(1.0 + (jnp.pi / 8.0) * safe))


def negative_binomial_gaussian_mean(mean, variance, *, total_count):
    """E[count] = r exp(m + v/2) (reference pg_classifier.py:194-201)."""
    return total_count * jnp.exp(mean + 0.5 * jnp.maximum(variance, 0.0))


def pg_omega_expectation(c, pg_b):
    """E[omega | c] = b/(2c) tanh(c/2), small-c limit b/4
    (reference pg_classifier.py:252-258)."""
    safe = jnp.maximum(c, 1e-12)
    mean = 0.5 * pg_b * jnp.tanh(0.5 * safe) / safe
    return jnp.where(c > 1e-8, mean, 0.25 * pg_b)


@lru_cache(maxsize=None)
def _gauss_hermite_normal_rule(num_nodes: int):
    """Nodes/weights for E_{z~N(0,1)} f(z) (reference pg_classifier.py:204-211)."""
    base_nodes, base_weights = np.polynomial.hermite.hermgauss(num_nodes)
    return (np.sqrt(2.0) * base_nodes, base_weights / np.sqrt(np.pi))


def expected_log_sigmoid_neg_gaussian(mean, variance, *, quadrature_nodes: int):
    """E[log sigmoid(-F)] by Gauss-Hermite (reference pg_classifier.py:214-228)."""
    nodes, weights = _gauss_hermite_normal_rule(quadrature_nodes)
    nodes = jnp.asarray(nodes, mean.dtype)
    weights = jnp.asarray(weights, mean.dtype)
    std = jnp.sqrt(jnp.maximum(variance, 0.0))
    pts = mean[..., None] + std[..., None] * nodes
    return jnp.sum(jax.nn.log_sigmoid(-pts) * weights, axis=-1)


def negative_binomial_total_count_gradient(targets, mean, variance, *,
                                           total_count, quadrature_nodes: int):
    """d ELBO / d r for the NB likelihood (reference pg_classifier.py:231-249)."""
    r = jnp.asarray(total_count, mean.dtype)
    els = expected_log_sigmoid_neg_gaussian(mean, variance,
                                            quadrature_nodes=quadrature_nodes)
    return jnp.sum(jax.scipy.special.digamma(targets + r)
                   - jax.scipy.special.digamma(r) + els)


# ---------------------------------------------------------------------------
# spectral state + weighted Toeplitz
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PGSpectralState:
    """EFGP grid artifacts for the PG model (reference _SpectralState,
    pg_classifier.py:62-75)."""
    h: jnp.ndarray
    ws: jnp.ndarray        # (M,) complex sqrt(S h^d)
    ws2: jnp.ndarray       # (M,) complex S h^d
    Dprime: jnp.ndarray    # (M, H) complex h^d dS/dtheta
    nufft: NUFFT
    toeplitz: ToeplitzND   # unweighted Gram F*F (kept for parity/diagnostics)
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)
    d: int = dataclasses.field(metadata={"static": True}, default=1)

    @property
    def M(self) -> int:
        return self.mtot ** self.d


jax.tree_util.register_dataclass(
    PGSpectralState,
    data_fields=["h", "ws", "ws2", "Dprime", "nufft", "toeplitz"],
    meta_fields=["mtot", "d"],
)


@partial(jax.jit, static_argnames=("mtot",))
def build_pg_spectral_state(x, kernel, h, *, mtot: int,
                            ws_mask=None) -> PGSpectralState:
    """Grid + weights + operators (reference _build_spectral_state,
    pg_classifier.py:310-374)."""
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    rdtype = x.dtype
    cdtype = _cdtype(rdtype)
    h = jnp.asarray(h, rdtype)
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=rdtype) * h, d)
    s = kernel.spectral_density(xis)
    if ws_mask is not None:
        s = s * ws_mask
    ws2 = (s * h**d).astype(cdtype)
    ws = jnp.sqrt(ws2)
    Dprime = (h**d) * kernel.spectral_grad(xis)
    if ws_mask is not None:
        Dprime = Dprime * ws_mask[:, None]
    Dprime = Dprime.astype(cdtype)
    nufft = make_nufft(x, h, mtot, cdtype=cdtype)
    toeplitz = make_toeplitz(convolution_vector(m, x, h))
    return PGSpectralState(h=h, ws=ws, ws2=ws2, Dprime=Dprime, nufft=nufft,
                           toeplitz=toeplitz, mtot=mtot, d=d)


def weighted_toeplitz_from_points(x, h, mtot: int, delta,
                                  cdtype=None) -> ToeplitzND:
    """Build ``F* diag(delta) F`` for points ``x``; see
    :func:`weighted_toeplitz`."""
    if x.ndim == 1:
        x = x[:, None]
    op = make_nufft(x, h, 2 * mtot - 1, cdtype=cdtype)
    v = op.type1(delta.astype(op.phases[0].dtype))
    return make_toeplitz(v)


def weighted_toeplitz(spectral: PGSpectralState, x, delta) -> ToeplitzND:
    """Exact weighted Gram ``F* diag(delta) F`` as a Toeplitz operator whose
    lag table is one type-1 NUFFT of delta on the doubled grid (reference
    _build_weighted_toeplitz, pg_classifier.py:377-384; exact here — the
    reference fixes NUFFT eps at construction)."""
    return weighted_toeplitz_from_points(x, spectral.h, spectral.mtot, delta,
                                         cdtype=spectral.ws.dtype)


# ---------------------------------------------------------------------------
# solvers
# ---------------------------------------------------------------------------

def _wtoe_kron_precond(Ds, wtoe: ToeplitzND, mtot: int, d: int):
    """Kronecker eigen-preconditioner for the symmetrized PG system
    ``I + Ds T_w Ds`` (ops/kron_precond.py math with unit identity
    coefficient): ``T_w = F* diag(delta) F`` concentrates on the product
    of its 1-D marginal weighted Grams over sum(delta)^{d-1}, and the
    marginal lag tables are axis slices of the weighted lag table — the
    same separability the EFGP solves exploit, with delta playing the
    role of the point measure.  The lag table is recovered from the
    cached kernel spectrum (two small FFTs)."""
    from ..ops.kron_precond import kron_eig_build, make_kron_precond
    Ls = tuple(2 * n - 1 for n in wtoe.ns)
    v = jnp.fft.ifftn(wtoe.fft_kernel)[tuple(slice(0, l) for l in Ls)]
    kp = kron_eig_build(Ds, v, 1.0, mtot=mtot, d=d,
                        diag_scale=toeplitz_diag_scale(v))
    return make_kron_precond(kp)


def _feature_solver(spectral: PGSpectralState, wtoe: ToeplitzND, *,
                    cg_tol: float, max_cg_iter: int = 2000):
    """Symmetrized solver for ``A = I + Ds F* Omega F Ds`` with
    ``Ds = sqrt(ws2)`` floored away from zero (reference
    _make_feature_space_solver, pg_classifier.py:439-504).

    Returns ``solve(q) -> (beta, iters)`` where ``beta`` solves
    ``(D2^{-1} + F* Omega F)^{-1}``-style systems via
    ``beta = Ds^{-1} (I + S)^{-1} Ds q``.
    """
    D2 = jnp.real(spectral.ws2)
    eps_d = jnp.maximum(jnp.mean(D2) * 1e-14, 1e-14)
    Ds = jnp.sqrt(jnp.maximum(D2, eps_d)).astype(spectral.ws.dtype)
    Ds_inv = 1.0 / Ds
    M_inv = _wtoe_kron_precond(Ds, wtoe, spectral.mtot, spectral.d)

    def apply_IpS(Y):
        return Y + Ds * wtoe(Ds * Y)

    def solve(q):
        rhs = Ds * q.astype(Ds.dtype)
        res = pcg(apply_IpS, rhs, tol=cg_tol, maxiter=max_cg_iter,
                  M_inv=M_inv)
        beta = Ds_inv * res.x
        return beta, res.iters

    return solve


# ---------------------------------------------------------------------------
# E-step
# ---------------------------------------------------------------------------

class EstepResult(NamedTuple):
    delta: jnp.ndarray
    mean: jnp.ndarray
    sigma_diag: jnp.ndarray
    residual: jnp.ndarray
    cg_iters: jnp.ndarray
    iters_used: jnp.ndarray


@partial(jax.jit, static_argnames=("max_iters", "cg_tol", "max_cg_iter"))
def estep_pass(spectral: PGSpectralState, wtoe_builder_x, delta0, kappa,
               pg_b, probes, *, max_iters: int, rho0: float, gamma: float,
               cg_tol: float, max_cg_iter: int = 2000,
               tol=0.0) -> EstepResult:
    """Damped fixed point on the PG variational diagonal Delta
    (reference _run_estep, pg_classifier.py:507-582).

    Per inner iteration: apply Sigma = F D (I + D F* Delta F D)^{-1} D F*
    to [kappa; probes] with one batched CG, estimate diag(Sigma) by probe
    correlation, update Delta <- (1-rho) Delta + rho E[omega|c].

    ``tol`` is the reference's ``e_step_tol`` early stop
    (pg_classifier.py:574-576): once ``max|Delta - Lambda| < tol`` after an
    update, later iterations are skipped (``lax.cond`` — the solve does not
    run) and ``iters_used`` reports how many iterations actually executed.

    ``wtoe_builder_x`` is the training-point array (the weighted Toeplitz is
    rebuilt inside each iteration since Delta changes).
    """
    rdtype = kappa.dtype
    cdtype = spectral.ws.dtype
    n = kappa.shape[0]
    n_probes = probes.shape[0]
    x = wtoe_builder_x
    tol = jnp.asarray(tol, rdtype)

    def body(carry, it):
        delta, _, _, _, residual, used = carry
        wtoe = weighted_toeplitz_from_points(x, spectral.h, spectral.mtot,
                                             delta.astype(cdtype),
                                             cdtype=cdtype)
        Z = jnp.concatenate([kappa[None, :], probes], axis=0)
        rhs = spectral.ws[None, :] * spectral.nufft.type1(Z.astype(cdtype)
                                                          ).reshape(Z.shape[0], -1)

        def A_feat(u):
            return u + spectral.ws * wtoe(spectral.ws * u)

        M_inv = _wtoe_kron_precond(spectral.ws, wtoe, spectral.mtot,
                                   spectral.d)
        res = pcg(A_feat, rhs, tol=cg_tol, maxiter=max_cg_iter,
                  M_inv=M_inv)
        S_all = spectral.nufft.type2(spectral.ws[None, :] * res.x).real
        mean = S_all[0]
        Sz = S_all[1:]
        sigma_diag = jnp.mean(probes * Sz, axis=0) if n_probes > 0 \
            else jnp.zeros_like(mean)
        c = jnp.sqrt(jnp.maximum(sigma_diag + mean**2, 1e-12))
        Lam = pg_omega_expectation(c, pg_b)
        rho = rho0 / (1.0 + gamma * it)
        delta_new = jnp.maximum((1.0 - rho) * delta + rho * Lam, 0.0)
        residual = jnp.max(jnp.abs(delta_new - Lam))
        return (delta_new, mean, sigma_diag, res.iters, residual, used + 1)

    def step(carry, it):
        # reference breaks AFTER the iteration whose residual dips below
        # tol, so the check gates the NEXT iteration
        done = carry[4] < tol
        return jax.lax.cond(done, lambda c: c, lambda c: body(c, it), carry)

    carry = (delta0, jnp.zeros((n,), rdtype), jnp.zeros((n,), rdtype),
             jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, rdtype),
             jnp.asarray(0, jnp.int32))
    # lax.scan keeps the program size CONSTANT in e_step_iters (a Python
    # loop would inline one CG + NUFFT pipeline per iteration); the
    # early-stop cond inside `step` skips converged iterations at runtime
    carry, _ = jax.lax.scan(lambda c, it: (step(c, it), None), carry,
                            jnp.arange(max_iters))
    delta, mean, sigma_diag, iters, residual, used = carry
    return EstepResult(delta=delta, mean=mean, sigma_diag=sigma_diag,
                       residual=residual, cg_iters=iters, iters_used=used)


# ---------------------------------------------------------------------------
# M-step
# ---------------------------------------------------------------------------

class MstepResult(NamedTuple):
    grad: jnp.ndarray        # (H,) d ELBO / d (lengthscale, variance)
    term1: jnp.ndarray
    term2: jnp.ndarray
    beta_mean: jnp.ndarray
    cg_iters: jnp.ndarray


@partial(jax.jit, static_argnames=("cg_tol", "max_cg_iter"))
def mstep_gradient(spectral: PGSpectralState, x, delta, kappa, probes, *,
                   cg_tol: float, max_cg_iter: int = 2000) -> MstepResult:
    """Stochastic M-step gradient wrt (lengthscale, variance)
    (reference _compute_mstep_gradient, pg_classifier.py:585-631):

      term1 = Dprime^T |beta_kappa|^2            (data-fit pull)
      term2 = E_probes Re[(conj(F* Omega z) . beta_z)^T Dprime]  (trace)
      grad  = 0.5 (term1 - term2),   ascent direction for the ELBO.
    """
    cdtype = spectral.ws.dtype
    wtoe = weighted_toeplitz_from_points(x, spectral.h, spectral.mtot,
                                         delta.astype(cdtype), cdtype=cdtype)
    solve = _feature_solver(spectral, wtoe, cg_tol=cg_tol,
                            max_cg_iter=max_cg_iter)
    n_probes = probes.shape[0]
    pz = probes.astype(cdtype)
    Q = spectral.nufft.type1(pz).reshape(n_probes, -1)
    q_y = spectral.nufft.type1(kappa.astype(cdtype)).reshape(-1)
    Q_all = jnp.concatenate([Q, q_y[None, :]], axis=0)
    beta_all, iters = solve(Q_all)
    beta_probes = beta_all[:-1]
    beta_k = beta_all[-1]

    Rfeat = spectral.nufft.type1((delta.astype(cdtype) * pz)
                                 ).reshape(n_probes, -1)
    vals = jnp.real((jnp.conj(Rfeat) * beta_probes) @ spectral.Dprime)
    term2 = jnp.mean(vals, axis=0)
    term1 = jnp.real(spectral.Dprime).T @ jnp.abs(beta_k) ** 2
    grad = 0.5 * (term1 - term2)
    return MstepResult(grad=grad, term1=term1, term2=term2,
                       beta_mean=beta_k, cg_iters=iters)


@partial(jax.jit, static_argnames=("cg_tol", "max_cg_iter"))
def solve_beta_mean(spectral: PGSpectralState, x, delta, kappa, *,
                    cg_tol: float, max_cg_iter: int = 2000):
    """Posterior-mean feature weights (reference _solve_beta_mean,
    pg_classifier.py:634-650)."""
    cdtype = spectral.ws.dtype
    wtoe = weighted_toeplitz_from_points(x, spectral.h, spectral.mtot,
                                         delta.astype(cdtype), cdtype=cdtype)
    solve = _feature_solver(spectral, wtoe, cg_tol=cg_tol,
                            max_cg_iter=max_cg_iter)
    q_y = spectral.nufft.type1(kappa.astype(cdtype)).reshape(-1)
    beta, iters = solve(q_y[None, :])
    return beta[0], iters


# ---------------------------------------------------------------------------
# predictions
# ---------------------------------------------------------------------------

@jax.jit
def predictive_mean(spectral: PGSpectralState, x_new, beta_mean):
    """Latent predictive mean F_new (ws2 beta) (reference _predictive_mean,
    pg_classifier.py:653-668)."""
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    op = make_nufft(x_new, spectral.h, spectral.mtot,
                    cdtype=spectral.ws.dtype)
    return op.type2((spectral.ws2 * beta_mean)
                    .reshape((spectral.mtot,) * spectral.d)).real


@partial(jax.jit, static_argnames=("mtot",))
def _build_weighted_toeplitz(x, h, mtot: int, delta) -> ToeplitzND:
    """Jitted ``F* diag(delta) F`` builder (the whole build must sit inside
    jit: axon cannot materialize eager complex constants)."""
    return weighted_toeplitz_from_points(x, h, mtot, delta,
                                         cdtype=delta.dtype)


@partial(jax.jit, static_argnames=("cg_tol", "max_cg_iter"))
def _variance_exact_from_op(spectral: PGSpectralState, wtoe: ToeplitzND,
                            x_new, *, cg_tol: float, max_cg_iter: int = 2000):
    """Exact per-target latent variance against a PREBUILT weighted Toeplitz
    operator: phi^H ws2 A^{-1} phi with the symmetrized solver (reference
    _predictive_latent_moments, pg_classifier.py:671-739)."""
    solve = _feature_solver(spectral, wtoe, cg_tol=cg_tol,
                            max_cg_iter=max_cg_iter)
    from .efgp import posterior_fourier_rows
    phi = jnp.conj(posterior_fourier_rows(x_new, spectral.h, spectral.mtot,
                                          spectral.d))
    beta, _ = solve(phi)
    return jnp.maximum(
        jnp.real(jnp.sum(jnp.conj(phi) * (spectral.ws2[None, :] * beta),
                         axis=1)), 0.0)


def predictive_variance_exact(spectral: PGSpectralState, x, delta, x_new, *,
                              cg_tol: float, max_cg_iter: int = 2000):
    """Exact per-target latent variance: phi^H ws2 A^{-1} phi with the
    symmetrized solver (reference _predictive_latent_moments,
    pg_classifier.py:671-739)."""
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    cdtype = spectral.ws.dtype
    wtoe = _build_weighted_toeplitz(x, spectral.h, spectral.mtot,
                                    delta.astype(cdtype))
    return _variance_exact_from_op(spectral, wtoe, x_new, cg_tol=cg_tol,
                                   max_cg_iter=max_cg_iter)


@jax.jit
def dense_feature_system(spectral: PGSpectralState, x, delta):
    """Materialize + invert the symmetrized feature-space system
    ``A = I + Ds (F* diag(delta) F) Ds`` (M x M, ``Ds = sqrt(ws2)``
    floored) ONCE for a fixed posterior ``delta``.

    TPU-first replacement for per-chunk CG at prediction time: the PG
    grid is small by construction (M = mtot^d), the system is shared by
    every prediction target, and a dense inverse + iterative refinement
    answers each batch of targets with two matmuls (same rationale as
    ops/dense_solve.py; the reference instead re-runs CG per batch,
    pg_classifier.py:671-739).  Only valid for
    ``spectral.M <= DENSE_SOLVER_MAX_M``.

    Returns ``(A, P, Ds)`` with ``P ~ inv(A)``.
    """
    cdtype = spectral.ws.dtype
    op = make_nufft(x, spectral.h, 2 * spectral.mtot - 1, cdtype=cdtype)
    v = op.type1(delta.astype(cdtype))
    Tw = dense_toeplitz(v, spectral.mtot, spectral.d)
    D2 = jnp.real(spectral.ws2)
    eps_d = jnp.maximum(jnp.mean(D2) * 1e-14, 1e-14)
    Ds = jnp.sqrt(jnp.maximum(D2, eps_d)).astype(cdtype)
    A = Ds[:, None] * Tw * Ds[None, :] + jnp.eye(Tw.shape[0], dtype=cdtype)
    return A, dense_inverse(A), Ds


@partial(jax.jit, static_argnames=("passes",))
def _variance_exact_dense_apply(spectral: PGSpectralState, A, P, Ds, x_new,
                                *, passes: int = 2):
    """phi^H ws2 A^{-1} phi for one target batch against the prebuilt
    dense system (same algebra as :func:`_variance_exact_from_op`)."""
    from .efgp import posterior_fourier_rows
    phi = jnp.conj(posterior_fourier_rows(x_new, spectral.h, spectral.mtot,
                                          spectral.d))
    res = refine_solve(A, P, Ds[None, :] * phi, passes=passes, check=False)
    beta = res.x / Ds[None, :]
    return jnp.maximum(
        jnp.real(jnp.sum(jnp.conj(phi) * (spectral.ws2[None, :] * beta),
                         axis=1)), 0.0)


def predictive_variance_exact_dense(spectral: PGSpectralState, x, delta,
                                    x_new, *, batch_size=None,
                                    system=None, passes=None):
    """Exact variance for all targets via ONE dense factorization.

    ``system``: optional prebuilt ``(A, P, Ds)`` from
    :func:`dense_feature_system` (lets estimators cache it across
    predict calls — ``delta`` is frozen after fit).  ``batch_size``
    bounds the (B, M) row-batch memory; dense batches can be much larger
    than CG ones (default: min(4096, n_new)).  ``passes`` defaults
    dtype-aware: 1 IR pass in complex128 (the inverse is already at the
    f64 floor), 2 in complex64.
    """
    if spectral.M > DENSE_SOLVER_MAX_M:
        raise ValueError(
            f"dense prediction solver needs M <= {DENSE_SOLVER_MAX_M}; "
            f"got M = {spectral.M}. Use solver='cg'.")
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    A, P, Ds = (dense_feature_system(spectral, x, delta)
                if system is None else system)
    if passes is None:
        passes = 1 if A.dtype == jnp.complex128 else 2
    n_new = x_new.shape[0]
    b = min(4096, n_new) if batch_size is None else int(batch_size)
    if n_new <= b:
        return _variance_exact_dense_apply(spectral, A, P, Ds, x_new,
                                           passes=passes)
    pad = (-n_new) % b
    xp = jnp.concatenate([x_new, jnp.broadcast_to(x_new[:1], (pad,
                                                              x_new.shape[1]))]
                         ) if pad else x_new
    chunks = [_variance_exact_dense_apply(
        spectral, A, P, Ds, jax.lax.dynamic_slice_in_dim(xp, s, b),
        passes=passes) for s in range(0, n_new + pad, b)]
    return jnp.concatenate(chunks)[:n_new]


def predictive_variance_exact_batched(spectral: PGSpectralState, x, delta,
                                      x_new, *, batch_size, cg_tol: float,
                                      max_cg_iter: int = 2000):
    """Microbatched exact variance: chunks targets by ``batch_size`` so the
    per-chunk (B, M) Fourier-row matrix bounds peak memory (reference
    _predictive_latent_moments batching, pg_classifier.py:1087,1168).

    Every chunk is padded to exactly ``batch_size`` rows so the jitted
    exact kernel compiles once regardless of the target count, and the
    weighted Toeplitz operator — one type-1 NUFFT over ALL n training
    points — is built ONCE and shared by every chunk (it depends only on
    the training data, not the targets).
    """
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    n_new = x_new.shape[0]
    if batch_size is None or n_new <= int(batch_size):
        return predictive_variance_exact(spectral, x, delta, x_new,
                                         cg_tol=cg_tol,
                                         max_cg_iter=max_cg_iter)
    cdtype = spectral.ws.dtype
    wtoe = _build_weighted_toeplitz(x, spectral.h, spectral.mtot,
                                    delta.astype(cdtype))
    b = int(batch_size)
    pad = (-n_new) % b
    xp = jnp.concatenate([x_new, jnp.broadcast_to(x_new[:1], (pad,
                                                              x_new.shape[1]))]
                         ) if pad else x_new
    chunks = [_variance_exact_from_op(spectral, wtoe,
                                      jax.lax.dynamic_slice_in_dim(xp, s, b),
                                      cg_tol=cg_tol,
                                      max_cg_iter=max_cg_iter)
              for s in range(0, n_new + pad, b)]
    return jnp.concatenate(chunks)[:n_new]


@partial(jax.jit, static_argnames=("cg_tol", "max_cg_iter"))
def stochastic_variance_sums(spectral: PGSpectralState, x, delta, etas, *,
                             cg_tol: float, max_cg_iter: int = 2000):
    """Hutchinson lag sums for the stochastic predictive variance
    (reference _estimate_stochastic_variance_sums,
    pg_classifier.py:767-811)."""
    cdtype = spectral.ws.dtype
    wtoe = weighted_toeplitz_from_points(x, spectral.h, spectral.mtot,
                                         delta.astype(cdtype), cdtype=cdtype)
    solve = _feature_solver(spectral, wtoe, cg_tol=cg_tol,
                            max_cg_iter=max_cg_iter)
    J = etas.shape[0]
    beta, _ = solve(etas.astype(cdtype))
    gammas = spectral.ws2[None, :] * beta
    mtot, d = spectral.mtot, spectral.d
    shape = (J,) + (mtot,) * d
    s_size = (2 * mtot - 1,) * d
    axes = tuple(range(1, d + 1))
    G = jnp.fft.fftn(gammas.reshape(shape), s=s_size, axes=axes)
    E = jnp.fft.fftn(etas.reshape(shape).astype(G.dtype), s=s_size,
                     axes=axes)
    return jnp.mean(jnp.fft.ifftn(G * jnp.conj(E), s=s_size, axes=axes),
                    axis=0)


@jax.jit
def evaluate_variance_sums(spectral: PGSpectralState, est_sums, x_new):
    """FFT-ordered type-2 evaluation of the lag sums at targets (reference
    _evaluate_stochastic_variance_sums, pg_classifier.py:814-837)."""
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    op = make_nufft(x_new, spectral.h, 2 * spectral.mtot - 1,
                    cdtype=spectral.ws.dtype, fft_order=True)
    return jnp.maximum(op.type2(est_sums).real, 0.0)


# ---------------------------------------------------------------------------
# Chebyshev-interpolated variance
# ---------------------------------------------------------------------------

def chebyshev_lobatto_nodes(a: float, b: float, n_nodes: int):
    """Chebyshev-Lobatto nodes + barycentric weights on [a, b]
    (reference _chebyshev_lobatto_nodes, pg_classifier.py:879-891)."""
    if n_nodes < 2:
        raise ValueError("chebyshev nodes must be at least 2.")
    k = np.arange(n_nodes, dtype=np.float64)
    nodes_std = np.cos(np.pi * k / (n_nodes - 1))
    weights = np.ones(n_nodes)
    weights[0] = 0.5
    weights[-1] = 0.5
    weights *= (-1.0) ** k
    nodes = 0.5 * (a + b) + 0.5 * (b - a) * nodes_std
    scale = 2.0 / (b - a) if b > a else 1.0
    order = np.argsort(nodes)
    return nodes[order], (weights * scale)[order]


def barycentric_matrix(nodes, weights, targets, *, atol: float = 1e-14):
    """Barycentric interpolation matrix rows (reference
    _barycentric_interpolation_matrix, pg_classifier.py:894-920)."""
    nodes = np.asarray(nodes, np.float64)
    weights = np.asarray(weights, np.float64)
    targets = np.asarray(targets, np.float64)
    diff = targets[:, None] - nodes[None, :]
    mat = np.empty((targets.size, nodes.size))
    close = np.isclose(diff, 0.0, atol=atol, rtol=0.0)
    matched = close.any(axis=1)
    if np.any(matched):
        idx = np.argmax(close[matched], axis=1)
        mat[matched] = 0.0
        mat[np.where(matched)[0], idx] = 1.0
    un = ~matched
    if np.any(un):
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = weights[None, :] / diff[un]
        mat[un] = raw / raw.sum(axis=1, keepdims=True)
    return mat


def predictive_variance_chebyshev(spectral: PGSpectralState, x, delta,
                                  x_new, *, n_nodes_per_dim: int,
                                  cg_tol: float, max_cg_iter: int = 2000,
                                  batch_size=None, solver: str = "cg",
                                  system=None):
    """Variance on a Chebyshev-Lobatto tensor grid, barycentric-interpolated
    to targets (reference _predictive_variance_chebyshev,
    pg_classifier.py:945-1009).  Cost: exact variance at n_nodes^d points
    instead of n_targets; the node evaluation honors ``batch_size``
    (reference pg_classifier.py:1193)."""
    x_new = np.asarray(x_new)
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    d = x_new.shape[1]
    axes_nodes, mats = [], []
    for dim in range(d):
        coord = x_new[:, dim]
        lo, hi = float(coord.min()), float(coord.max())
        if np.isclose(lo, hi):
            pad = max(abs(lo), 1.0) * 1e-6
            lo, hi = lo - pad, hi + pad
        nodes, weights = chebyshev_lobatto_nodes(lo, hi, n_nodes_per_dim)
        mats.append(jnp.asarray(barycentric_matrix(nodes, weights, coord)))
        axes_nodes.append(nodes)
    mesh = np.stack(np.meshgrid(*axes_nodes, indexing="ij"), -1).reshape(-1, d)
    mesh_t = jnp.asarray(mesh, dtype=jnp.asarray(x).dtype)
    if solver == "dense":
        node_var = predictive_variance_exact_dense(
            spectral, x, delta, mesh_t, batch_size=batch_size, system=system)
    else:
        node_var = predictive_variance_exact_batched(
            spectral, x, delta, mesh_t,
            batch_size=batch_size, cg_tol=cg_tol, max_cg_iter=max_cg_iter)
    node_grid = node_var.reshape((n_nodes_per_dim,) * d)
    letters = "abcdefghij"[:d]
    expr = (",".join(f"n{c}" for c in letters) + "," + letters + "->n")
    # HIGHEST: bf16-pass contraction of the alternating-sign barycentric
    # rows costs ~4e-3 of the grid scale on TPU (see efgp._cheb_eval)
    interp = jnp.einsum(expr, *[m.astype(node_grid.dtype) for m in mats],
                        node_grid, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(interp, 0.0)


# ---------------------------------------------------------------------------
# fused outer step
# ---------------------------------------------------------------------------

class OuterStepResult(NamedTuple):
    delta: jnp.ndarray
    mean: jnp.ndarray
    sigma_diag: jnp.ndarray
    e_residual: jnp.ndarray
    e_iters_used: jnp.ndarray
    e_cg_iters: jnp.ndarray
    m_grad: jnp.ndarray
    m_cg_iters: jnp.ndarray
    raw: jnp.ndarray
    opt_state: tuple


@partial(jax.jit, static_argnames=("mtot", "e_iters", "n_m_probes",
                                   "cg_tol", "max_cg_iter", "lr"))
def outer_step(x, kern, h, ws_mask, delta, kappa, pg_b, e_probes, m_key,
               raw, opt_state, *, mtot: int, e_iters: int, n_m_probes: int,
               rho0: float, gamma: float, e_tol, cg_tol: float, lr: float,
               max_cg_iter: int = 2000, m_mask=None) -> OuterStepResult:
    """One full EM outer iteration as a single compiled program: spectral
    state build + damped E-step + stochastic M-step + Adam ascent.

    Replaces the estimator loop's 8-9 separate dispatches (each ~25-100 ms
    through the remote-TPU tunnel) with one, and collapses the per-bucket
    compile set (build/estep/mstep/adam) into one executable.  Matches the
    reference's per-iteration flow (pg_classifier.py:1286-1337) exactly;
    the m-step Rademacher probes are drawn inside from ``m_key``
    (reference seed 10_000 + outer, pg_classifier.py:1318).

    ``m_mask`` (optional, (n,)): validity mask for n-bucketed (padded)
    training points — the in-step M-step probes are zeroed on the pad so
    padded points contribute nothing (padded delta/kappa/pg_b/e_probes are
    already zero, which keeps the E-step exact without a mask).
    """
    import optax

    spectral = build_pg_spectral_state(x, kern, h, mtot=mtot,
                                       ws_mask=ws_mask)
    eres = estep_pass(spectral, x, delta, kappa, pg_b, e_probes,
                      max_iters=e_iters, rho0=rho0, gamma=gamma,
                      cg_tol=cg_tol, max_cg_iter=max_cg_iter, tol=e_tol)
    n = x.shape[0]
    m_probes = (jax.random.bernoulli(m_key, 0.5, (n_m_probes, n)) * 2 - 1
                ).astype(kappa.dtype)
    if m_mask is not None:
        m_probes = m_probes * m_mask[None, :].astype(m_probes.dtype)
    mres = mstep_gradient(spectral, x, eres.delta, kappa, m_probes,
                          cg_tol=cg_tol, max_cg_iter=max_cg_iter)
    grad = jnp.real(mres.grad)
    tx = optax.adam(lr)
    grad_raw = grad * jnp.exp(raw)
    updates, opt_state = tx.update(-grad_raw, opt_state, raw)
    raw = optax.apply_updates(raw, updates)
    return OuterStepResult(delta=eres.delta, mean=eres.mean,
                           sigma_diag=eres.sigma_diag,
                           e_residual=eres.residual,
                           e_iters_used=eres.iters_used,
                           e_cg_iters=eres.cg_iters, m_grad=grad,
                           m_cg_iters=mres.cg_iters, raw=raw,
                           opt_state=opt_state)
