"""PG classifier with an oracle-grade df64 prediction leg.

The reference's PG estimators run float64 end-to-end
(reference polyagamma_classification/pg_classifier.py:1094).  gpquad's
VI loop is f32 (right for TPU), and the final predictions get a df64
(double-word) leg: ``PolyagammaGPClassifier.predict_latent_high`` re-runs
the beta-mean solve and the exact per-target latent moments in df64
iterative refinement (models/pg_high.py), certified at <=1e-6 agreement
with the f64 dense feature system.

This walkthrough fits the classifier, then shows the three tiers on the
SAME fitted posterior:

  1. f32 production predictions (decision_function / predictive_variance)
  2. df64 predictions (predict_latent_high)
  3. the numpy-f64 dense system solved directly (the oracle)

and prints each tier's agreement with the oracle.

Run: ``python examples/pg_high_precision.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=4000)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from gpquad import PolyagammaGPClassifier
    from gpquad.models.sampling import sample_bernoulli_gp_spectral
    from gpquad.utils.f64_oracles import (pg_beta_mean_f64, pg_f64_objects,
                                          pg_mean_f64, pg_var_f64)

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, size=(args.n, 2))
    yb, _ = sample_bernoulli_gp_spectral(jax.random.PRNGKey(0),
                                         jnp.asarray(X, jnp.float32),
                                         lengthscale=0.4, variance=4.0)
    y = np.asarray(yb).astype(int)

    clf = PolyagammaGPClassifier(max_iter=10, lengthscale_init=0.3,
                                 lr=0.05, n_e_probes=10, n_m_probes=10,
                                 random_state=0)
    clf.fit(X, y)
    Xt = rng.uniform(-0.9, 0.9, size=(200, 2))

    # tier 1: f32 production path
    mean32 = clf.decision_function(Xt)
    var32 = clf.predictive_variance(Xt)

    # tier 2: df64 leg on the same fitted posterior
    mean_hi, var_hi = clf.predict_latent_high(Xt)

    # tier 3: the numpy-f64 dense system (oracle)
    sp = clf._spectral_state_
    kern = clf._make_kernel_obj(clf.lengthscale_, clf.variance_, 2)
    obj = pg_f64_objects(np.asarray(clf._X_train_t_),
                         np.asarray(clf._delta_t_), kern,
                         float(np.asarray(sp.h)), sp.mtot)
    beta64 = pg_beta_mean_f64(obj, np.asarray(clf._kappa_t_))
    mean64 = pg_mean_f64(obj, Xt, beta64)
    var64 = pg_var_f64(obj, Xt)

    ms = np.max(np.abs(mean64))
    vs = np.max(var64)
    print(f"n={args.n}  mtot={sp.mtot}  M={sp.M}")
    print(f"latent mean | f32: {np.max(np.abs(mean32 - mean64)) / ms:.2e}"
          f"   df64: {np.max(np.abs(mean_hi - mean64)) / ms:.2e}")
    print(f"latent var  | f32: {np.max(np.abs(var32 - var64)) / vs:.2e}"
          f"   df64: {np.max(np.abs(var_hi - var64)) / vs:.2e}")
    assert np.max(np.abs(mean_hi - mean64)) / ms < 1e-6
    assert np.max(np.abs(var_hi - var64)) / vs < 1e-6
    print("PASS: df64 leg within 1e-6 of the f64 dense system")


if __name__ == "__main__":
    main()
