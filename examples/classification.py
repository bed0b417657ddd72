"""Polya-Gamma GP classification walkthrough (script form of the reference's
SLC17A7 spatial-transcriptomics analysis in polyagamma_classification/).

Run: ``python examples/classification.py [--cpu]``
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
    from gpquad import PolyagammaGPClassifier
    from gpquad.models.sampling import sample_bernoulli_gp_spectral

    # synthetic spatial expression pattern (stands in for adata_spatial.pt /
    # y_slc17a7.pt; real data plugs straight into the same estimator)
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, size=(3000, 2))
    yb, f = sample_bernoulli_gp_spectral(jax.random.PRNGKey(0),
                                         jnp.asarray(X, jnp.float32),
                                         lengthscale=0.4, variance=4.0)
    y = np.asarray(yb).astype(int)

    clf = PolyagammaGPClassifier(
        max_iter=15, lengthscale_init=0.3, lr=0.05, n_e_probes=10,
        n_m_probes=10, random_state=0,
        dtype="float64" if args.cpu else "float32",
        predictive_variance_method="chebyshev", verbose=1)
    clf.fit(X, y)
    acc = (clf.predict(X) == y).mean()
    print(f"train accuracy {acc:.3f}  "
          f"learned lengthscale {clf.lengthscale_:.3f} "
          f"variance {clf.variance_:.3f}")

    Xg = np.stack(np.meshgrid(np.linspace(-1, 1, 30),
                              np.linspace(-1, 1, 30)), -1).reshape(-1, 2)
    proba = clf.predict_proba(Xg)[:, 1]
    var = clf.predictive_variance(Xg)
    print(f"grid proba range [{proba.min():.3f}, {proba.max():.3f}]; "
          f"latent var range [{var.min():.3f}, {var.max():.3f}]")
    # success criteria: the boundary is learned, probabilities are
    # calibrated probabilities, the latent variance is a variance
    assert acc > 0.8, acc
    assert 0.0 <= proba.min() and proba.max() <= 1.0
    assert var.min() >= 0.0


if __name__ == "__main__":
    main()
