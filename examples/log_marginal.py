"""The log marginal likelihood: exact, determinant-lemma, and SLQ routes.

Script form of the reference's "Other Tests and Sanity Checks/
log_marginal_work.ipynb", which builds up the EFGP log-ML in three steps:

  1. the determinant identity moving the log-det from data space to
     feature space (notebook md cell 7):
         log|F D^2 F* + s2 I_n| = log|D F*F D / s2 + I_M| + n log s2,
     exact n x n vs exact M x M — same number, wildly different cost;
  2. stochastic Lanczos quadrature (SLQ) of the M-space determinant
     (notebook cells 12-14 run 10 repeated trials): mean/std across keys
     against the exact value, and convergence in probes;
  3. the full log-ML curve over a lengthscale sweep: the facade's
     EFGP.log_marginal() (SLQ + CG data-fit) against the dense-Cholesky
     kernel.log_marginal oracle — the shapes must agree and peak at the
     same lengthscale, which is what hyper-learning actually needs.

Run: ``python examples/log_marginal.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--eps", type=float, default=1e-4)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import numpy as np
    from gpquad.kernels import SquaredExponential
    from gpquad.models.efgp import tensor_grid
    from gpquad.models.model import EFGP
    from gpquad.models.sampling import sample_gp_dense
    from gpquad.ops.operators import convolution_vector
    from gpquad.ops.slq import logdet_slq
    from gpquad.ops.toeplitz import make_toeplitz
    from gpquad.quadrature import spectral_grid

    dtype = jnp.float64 if args.cpu else jnp.float32
    rng = np.random.default_rng(0)
    n, d, eps = args.n, 2, args.eps
    true_ell, sig2 = 0.2, 0.05
    kern = SquaredExponential(lengthscale=true_ell, variance=1.0, dimension=d)

    x = jnp.asarray(rng.uniform(0.0, 1.0, (n, d)), dtype)
    y = sample_gp_dense(jax.random.PRNGKey(0), x, kern,
                        noise_variance=sig2).astype(dtype)

    xis1, h, mtot = spectral_grid(kern, eps, 1.0)
    M = mtot ** d
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.asarray(xis1, dtype), d)
    ws2 = (kern.spectral_density(xis) * h ** d).astype(dtype)
    T = make_toeplitz(convolution_vector(m, x, h))
    print(f"n={n} d={d} eps={eps:g}  ->  mtot={mtot} M={M}")

    # -- 1) determinant identity: n-space vs M-space exact (md cell 7) ----
    @jax.jit
    def exact_dets(x, ws2):
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        F = jnp.exp(2j * jnp.pi * (x @ xis.T).astype(cdtype))
        ws = jnp.sqrt(ws2).astype(cdtype)
        Kn = jnp.real(F @ (ws2.astype(cdtype)[:, None] * F.conj().T))
        sign_n, logdet_n = jnp.linalg.slogdet(
            Kn + sig2 * jnp.eye(n, dtype=Kn.dtype))
        AM = (ws[:, None] * (F.conj().T @ F) * ws[None, :] / sig2
              + jnp.eye(M, dtype=cdtype))
        sign_M, logdet_M = jnp.linalg.slogdet(AM)
        return logdet_n, jnp.real(logdet_M) + n * jnp.log(sig2)

    ld_n, ld_M = exact_dets(x, ws2)
    print(f"\n[1] log|F D^2 F* + s2 I_n| (n-space exact) = {float(ld_n):.4f}")
    print(f"    log|D F*F D/s2 + I_M| + n log s2        = {float(ld_M):.4f}")
    assert abs(float(ld_n) - float(ld_M)) < 2e-2 * abs(float(ld_n))

    # -- 2) SLQ trials vs the exact determinant (cells 12-14) -------------
    ws_c = jnp.sqrt(ws2)
    print("\n[2] SLQ log-det across 10 keys (probes=64, steps=25):")
    vals = []
    for trial in range(10):
        vals.append(float(logdet_slq(
            ws_c.astype(jnp.complex128 if args.cpu else jnp.complex64),
            sig2, T, jax.random.PRNGKey(100 + trial), probes=64, steps=25,
            n=n)))
    vals = np.array(vals)
    print(f"    exact {float(ld_M):.3f}  SLQ mean {vals.mean():.3f} "
          f"+- {vals.std():.3f}  (rel dev {abs(vals.mean()-float(ld_M))/abs(float(ld_M)):.4f})")
    assert abs(vals.mean() - float(ld_M)) < 0.05 * abs(float(ld_M))

    print("    convergence in probes (one key):")
    for probes in (8, 32, 128):
        v = float(logdet_slq(
            ws_c.astype(jnp.complex128 if args.cpu else jnp.complex64),
            sig2, T, jax.random.PRNGKey(7), probes=probes, steps=25, n=n))
        print(f"      probes={probes:4d}: {v:9.3f} "
              f"(err {abs(v - float(ld_M)):.3f})")

    # -- 3) log-ML lengthscale curve: facade SLQ vs dense Cholesky --------
    print("\n[3] log-ML over a lengthscale sweep (facade SLQ vs dense):")
    ells = [0.08, 0.12, 0.2, 0.3, 0.45]
    rows = []
    for ell in ells:
        k = SquaredExponential(lengthscale=ell, variance=1.0, dimension=d)
        lm_dense = float(k.log_marginal(x, y, sig2))
        # estimate_params=False: the facade (like the reference,
        # efgpnd.py:421-438) otherwise overwrites the kernel's hypers with
        # the median heuristic — every sweep point would fit the same model
        model = EFGP(x, y, k, sigmasq=sig2, eps=eps, estimate_params=False,
                     opts={"log_marginal_probes": 64, "cg_tolerance": 1e-8})
        lm_slq = float(model.log_marginal(key=jax.random.PRNGKey(3)))
        rows.append((ell, lm_dense, lm_slq))
        print(f"    ell={ell:5.2f}: dense {lm_dense:9.2f}   "
              f"EFGP-SLQ {lm_slq:9.2f}")
    best_dense = max(rows, key=lambda r: r[1])[0]
    best_slq = max(rows, key=lambda r: r[2])[0]
    print(f"    argmax: dense ell={best_dense}, EFGP-SLQ ell={best_slq} "
          f"(true {true_ell})")
    assert best_dense == best_slq, (best_dense, best_slq)

    print("\nPASS: determinant identity, SLQ accuracy, and the log-ML "
          "curve agree")


if __name__ == "__main__":
    main()
