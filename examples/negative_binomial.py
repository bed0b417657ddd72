"""Negative-binomial GP count regression walkthrough (script form of the
reference's pg_negative_binomial_demo.ipynb and
pg_negative_binomial_learn_r_demo.ipynb, which drive
PolyagammaGPNegativeBinomialRegressor, reference pg_classifier.py:1511-1688).

Counts are modeled as NB(r, p) with a logistic link on a latent GP f:
p = sigmoid(f), so the conditional mean is r * exp(f).  Part 1 fits with the
dispersion r fixed at truth; part 2 starts r at the wrong value and learns it
by Gauss-Hermite gradient ascent on the marginal (learn_total_count=True).

Run: ``python examples/negative_binomial.py [--cpu]``
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

    import numpy as np
    from gpquad import PolyagammaGPNegativeBinomialRegressor

    # Synthetic spatial count field: latent log-rate f is a smooth surface,
    # counts ~ NB(r, p) with p = sigmoid(f) so E[y|f] = r * exp(f).
    rng = np.random.default_rng(0)
    n, r_true = 2500, 3.0
    X = rng.uniform(-1, 1, size=(n, 2))
    f = 0.9 * np.sin(2.2 * X[:, 0]) * np.cos(1.7 * X[:, 1]) - 0.3
    p = 1.0 / (1.0 + np.exp(-f))
    # numpy draws NB(n=r, p) with mean r*(1-p)/p, so pass 1-p for mean r*e^f
    y = rng.negative_binomial(r_true, 1.0 - p)
    print(f"counts: n={n} mean={y.mean():.2f} max={y.max()} "
          f"zeros={np.mean(y == 0):.1%}")

    # --- Part 1: dispersion fixed at truth -------------------------------
    reg = PolyagammaGPNegativeBinomialRegressor(
        total_count=r_true, max_iter=12, lengthscale_init=0.5, lr=0.05,
        n_e_probes=10, n_m_probes=10, random_state=0,
        dtype="float64" if args.cpu else "float32", verbose=1)
    reg.fit(X, y)
    mu = reg.predict(X)
    rate_true = r_true * np.exp(f)
    rel = np.mean(np.abs(mu - rate_true)) / np.mean(rate_true)
    corr = np.corrcoef(mu, rate_true)[0, 1]
    print(f"fixed-r fit: learned lengthscale {reg.lengthscale_:.3f} "
          f"variance {reg.variance_:.3f}")
    print(f"  mean count vs true rate: corr={corr:.3f} rel-L1={rel:.3f}")
    assert corr > 0.8, "predicted rate should track the true NB rate"

    # --- Part 2: learn the dispersion from a wrong start -----------------
    # Adam ascent on log(r) moves at most ~total_count_lr per update, so give
    # it an update every outer iteration and enough iterations to cover
    # log(3) - log(1) and settle (the trajectory overshoots once on Adam
    # momentum, then oscillates in toward the truth).
    reg2 = PolyagammaGPNegativeBinomialRegressor(
        total_count=1.0, learn_total_count=True, total_count_lr=0.1,
        total_count_update_frequency=1, max_iter=30, lengthscale_init=0.5,
        lr=0.05, n_e_probes=10, n_m_probes=10, random_state=0,
        store_history=True,
        dtype="float64" if args.cpu else "float32", verbose=0)
    reg2.fit(X, y)
    traj = [rec["total_count"] for rec in reg2.history_
            if "total_count" in rec]
    print(f"learned total_count trajectory: start 1.00 -> "
          f"peak {max(traj):.2f} -> final {reg2.total_count_:.2f} "
          f"(truth {r_true})")
    assert abs(reg2.total_count_ - r_true) < 1.0, \
        "learned dispersion should land near the truth"
    print("PASS: negative-binomial walkthrough")


if __name__ == "__main__":
    main()
