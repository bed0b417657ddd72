"""Operator-level sanity checks: every fast path against its dense oracle.

Script form of the reference's MainSanityChecks/efgpnd_sanity_checks.ipynb,
the notebook that validates the EFGP machinery piece by piece:

  1. the quadrature rule itself:  F D^2 F* approximates the kernel matrix
     K to the requested eps (notebook cells 9-12),
  2. NUFFT type-1/type-2 match the direct DFT matmuls (cells 13-16),
  3. ToeplitzND (FFT apply of F*F) matches the explicit Gram product
     (cells 17-20),
  4. the EFGP posterior mean matches a direct dense solve of the SAME
     approximate objective (cells 28-30),
  5. the Hutchinson lag-sum estimator c[r] behind the stochastic variance
     matches (a) a dense same-probe replica exactly and (b) the true
     diagonal-offset sums statistically (cells 31-35).

Run: ``python examples/operator_sanity.py [--cpu]``
(--cpu runs float64 and tightens every tolerance; the TPU run exercises
the exact f32 production path.)
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--eps", type=float, default=1e-4)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    # the dense oracles here build phases as exp(2 pi i x @ xis.T); at the
    # TPU default matmul precision that product carries bf16-level error
    # (~1e-2 in the reconstructed kernel).  The library's own NUFFT pins
    # HIGHEST + Dekker compensation internally (ops/nufft.py).
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import numpy as np
    from gpquad.kernels import SquaredExponential
    from gpquad.models.efgp import fit_with_grid, predict_mean, tensor_grid
    from gpquad.models.sampling import sample_gp_dense
    from gpquad.ops.nufft import make_nufft
    from gpquad.ops.operators import convolution_vector
    from gpquad.ops.toeplitz import make_toeplitz
    from gpquad.quadrature import spectral_grid

    dtype = jnp.float64 if args.cpu else jnp.float32
    rng = np.random.default_rng(0)
    n, d, eps = args.n, 2, args.eps
    ell, sig2 = 0.25, 0.1
    kern = SquaredExponential(lengthscale=ell, variance=1.0, dimension=d)

    # -- data: a dense-Cholesky GP draw (notebook cells 2-3) --------------
    x = jnp.asarray(rng.uniform(0.0, 1.0, (n, d)), dtype)
    y = sample_gp_dense(jax.random.PRNGKey(0), x, kern,
                        noise_variance=sig2).astype(dtype)

    xis1, h, mtot = spectral_grid(kern, eps, 1.0)
    M = mtot ** d
    print(f"n={n} d={d} eps={eps:g}  ->  h={float(h):.4f} mtot={mtot} M={M}")

    xis = tensor_grid(jnp.asarray(xis1, dtype), d)          # (M, d)
    S = kern.spectral_density(xis)
    ws2 = (S * h ** d).astype(dtype)                        # D^2 diagonal

    # all complex algebra stays inside jit: the axon TPU runtime cannot
    # materialize eager complex constants (CLAUDE.md)
    @jax.jit
    def dense_objects(x, y, ws2):
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        F = jnp.exp(2j * jnp.pi * (x @ xis.T).astype(cdtype))     # (n, M)
        Kapprox = jnp.real(F @ (ws2.astype(cdtype)[:, None] * F.conj().T))
        K = kern.kernel_matrix(x, x)
        G = F.conj().T @ F                                        # F* F
        ws = jnp.sqrt(ws2).astype(cdtype)
        A = (ws[:, None] * G * ws[None, :]
             + sig2 * jnp.eye(M, dtype=cdtype))
        beta = jnp.linalg.solve(A, ws * (F.conj().T @ y.astype(cdtype)))
        mean_direct = jnp.real(F @ (ws * beta))
        return Kapprox, K, G, A, mean_direct

    Kapprox, K, G, A, mean_direct = dense_objects(x, y, ws2)

    # -- 1) F D^2 F* approximates K (cells 9-12) --------------------------
    err = float(jnp.max(jnp.abs(Kapprox - K)))
    print(f"\n[1] max |F D^2 F* - K|        = {err:.3e}  (target ~eps={eps:g})")
    assert err < 50 * eps, err

    # -- 2) NUFFT vs direct DFT (cells 13-16) -----------------------------
    nufft = make_nufft(x, h, mtot)
    vals = jnp.asarray(rng.normal(size=n), dtype)

    # complex operands (NUFFT phases, Toeplitz kernel FFT, dense A) ride
    # through jit as ARGUMENTS: closing over them would embed eager
    # complex constants, which the axon TPU runtime cannot materialize
    @jax.jit
    def nufft_errs(nufft, vals):
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        F = jnp.exp(2j * jnp.pi * (x @ xis.T).astype(cdtype))
        t1 = nufft.type1(vals).reshape(-1)           # F* y (grid -> flat)
        e1 = jnp.max(jnp.abs(t1 - F.conj().T @ vals.astype(cdtype)))
        fk = (t1 / (1.0 + jnp.arange(M)))            # arbitrary modes
        t2 = nufft.type2(fk.reshape((mtot,) * d))    # F beta
        e2 = jnp.max(jnp.abs(t2 - F @ fk))
        return e1, e2, jnp.max(jnp.abs(t1))

    e1, e2, scale1 = nufft_errs(nufft, vals)
    tol = 1e-10 if args.cpu else 5e-3
    print(f"[2] NUFFT type-1 vs F* matmul = {float(e1):.3e} "
          f"(scale {float(scale1):.1e}), type-2 vs F matmul = {float(e2):.3e}")
    assert float(e1) < tol * max(1.0, float(scale1)) and float(e2) < tol * max(
        1.0, float(scale1)), (float(e1), float(e2))

    # -- 3) ToeplitzND vs explicit F*F (cells 17-20) ----------------------
    m = (mtot - 1) // 2
    T = make_toeplitz(convolution_vector(m, x, h))

    @jax.jit
    def toeplitz_err(T, G, key):
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        z = (jax.random.normal(key, (M,), dtype)
             + 1j * jax.random.normal(jax.random.split(key)[0], (M,), dtype)
             ).astype(cdtype)
        return jnp.max(jnp.abs(T(z) - G @ z)), jnp.max(jnp.abs(G @ z))

    et, scale_t = toeplitz_err(T, G, jax.random.PRNGKey(1))
    print(f"[3] ToeplitzND vs F*F matmul  = {float(et):.3e} "
          f"(scale {float(scale_t):.1e})")
    assert float(et) < tol * float(scale_t), float(et)

    # -- 4) EFGP posterior mean vs direct dense solve (cells 28-30) -------
    state = fit_with_grid(x, y, kern, sig2, h, mtot, cg_tol=1e-10,
                          max_cg_iter=2000)
    mean_fast = predict_mean(state, x)
    em = float(jnp.max(jnp.abs(mean_fast - mean_direct)))
    print(f"[4] EFGP mean vs dense solve  = {em:.3e}")
    assert em < (1e-8 if args.cpu else 2e-3), em

    # -- 5) Hutchinson lag sums c[r] (cells 31-35) ------------------------
    # fast path: gamma_j = D A^{-1} D eta_j, cross-correlated with eta on
    # the (2 mtot - 1)^d lag grid (models/efgp._variance_stochastic);
    # dense replica: the same probes through the dense A^{-1}.
    probes = 256
    etas = jnp.asarray(rng.integers(0, 2, (probes, M)) * 2 - 1, dtype)

    @jax.jit
    def lag_sums(A, etas):
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        ws = jnp.sqrt(ws2).astype(cdtype)
        Avar = A / sig2                        # A_var = G_w / sig2 + I
        gammas = ws[None, :] * jnp.linalg.solve(
            Avar, (ws[None, :] * etas.astype(cdtype)).T).T
        shape = (probes,) + (mtot,) * d
        s_size = (2 * mtot - 1,) * d
        axes = tuple(range(1, d + 1))
        Gf = jnp.fft.fftn(gammas.reshape(shape), s=s_size, axes=axes)
        Ef = jnp.fft.fftn(etas.reshape(shape).astype(cdtype), s=s_size,
                          axes=axes)
        est = jnp.mean(jnp.fft.ifftn(Gf * jnp.conj(Ef), axes=axes), axis=0)
        # true diagonal-offset sums of B = D A_var^{-1} D, offset r summed
        # over all index pairs with xi_i - xi_j = r (notebook cell 34)
        B = ws[:, None] * jnp.linalg.inv(Avar) * ws[None, :]
        idx = jnp.stack(jnp.meshgrid(*([jnp.arange(mtot)] * d),
                                     indexing="ij"), -1).reshape(-1, d)
        diffs = idx[:, None, :] - idx[None, :, :] + (mtot - 1)
        lin = jnp.zeros((2 * mtot - 1,) * d, cdtype)
        flat = jnp.ravel_multi_index(
            tuple(jnp.moveaxis(diffs, -1, 0)), (2 * mtot - 1,) * d,
            mode="clip")
        true = lin.reshape(-1).at[flat.reshape(-1)].add(B.reshape(-1))
        return est.reshape(-1), true

    est, true = lag_sums(A, etas)
    # fftshift: est indexes lag r at position r mod (2mtot-1); true at
    # r + (mtot-1).  Align by rolling est.
    est_g = jnp.fft.fftshift(est.reshape((2 * mtot - 1,) * d))
    true_g = true.reshape((2 * mtot - 1,) * d)
    rel = float(jnp.max(jnp.abs(est_g - true_g))
                / jnp.max(jnp.abs(true_g)))
    print(f"[5] Hutchinson c[r] vs true diagonal-offset sums: "
          f"max rel dev = {rel:.3f} with {probes} probes "
          f"(statistical, expect O(1/sqrt(J)) ~ {1/np.sqrt(probes):.3f})")
    assert rel < 8.0 / np.sqrt(probes), rel

    print("\nPASS: all operator-level sanity checks")


if __name__ == "__main__":
    main()
