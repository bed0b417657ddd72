"""Spatiotemporal GP: gridded SST-like field through time (d=3 EFGP).

The reference's exploration notebooks stop at d<=2 (its OISST notebook
fits single time slices); this walkthrough exercises the d=3 tensor-grid
path end to end — the same capability surface the reference's EFGPND
claims for general d (efgpnd.py:336-357) but never demonstrates at scale.

Synthetic "sea-surface temperature": a smooth spatial field whose anomaly
pattern propagates and decays over time, sampled at random (lon, lat, t)
triples with a sensor-outage gap in time.  Fit d=3 EFGP (deflation
preconditioner: this config needs ~900 unpreconditioned CG iterations,
~68 with the rank-1024 block), predict a full spatial slice at a held-out
time, compare to truth and to a dense-GP oracle on a subsample, and check
the posterior variance balloons inside the outage.

Run: ``python examples/spatiotemporal.py [--cpu] [--n 30000]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def field(lon, lat, t):
    """Propagating anomaly on a smooth background (all inputs in [0,1])."""
    import numpy as np
    base = 18.0 + 6.0 * np.cos(2.1 * (lat - 0.5)) + 0.8 * np.sin(3.0 * lon)
    cx = 0.25 + 0.5 * t                    # anomaly center drifts east
    cy = 0.45 + 0.15 * np.sin(4.0 * t)
    amp = 2.5 * np.exp(-1.5 * t)           # and decays
    anom = amp * np.exp(-(((lon - cx) / 0.16) ** 2 + ((lat - cy) / 0.12) ** 2))
    return base + anom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=30000)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import gpquad
    from gpquad.kernels import SquaredExponential

    dtype = jnp.float64 if args.cpu else jnp.float32
    rng = np.random.default_rng(9)
    n = args.n

    x = rng.uniform(0, 1, size=(n, 3))     # (lon, lat, t)
    # carve out a temporal gap (sensor outage): no observations for
    # t in (0.55, 0.8) — posterior variance must grow there
    gap = (x[:, 2] > 0.55) & (x[:, 2] < 0.8)
    x = x[~gap]
    n = len(x)
    y = field(x[:, 0], x[:, 1], x[:, 2]) + 0.2 * rng.normal(size=n)
    y_mean, y_std = y.mean(), y.std()
    yn = (y - y_mean) / y_std

    xj = jnp.asarray(x, dtype)
    yj = jnp.asarray(yn, dtype)

    kern = SquaredExponential(lengthscale=0.12, variance=1.0, dimension=3)
    # solver="cg": the auto dense factor-solve at M=19^3 is an MXU sweet
    # spot on TPU but a multi-minute complex inverse on CPU.  This config
    # is CG-hard (~900 unpreconditioned iterations); the deflation tier
    # (precond_rank) drops mean AND variance solves to a few dozen, and
    # the block is built once at fit time.
    state = gpquad.fit(xj, yj, kern, sigmasq=0.01, eps=1e-3, cg_tol=1e-6,
                       solver="cg" if args.cpu else "auto",
                       precond_rank=1024)
    print(f"d=3 fit: n={n}, mtot={state.mtot} "
          f"(M={state.mtot**3} modes), CG iters={int(state.mean_cg_iters)}")

    # full spatial slice at a held-out time
    t_star = 0.37
    res = 80
    g = np.linspace(0, 1, res)
    GX, GY = np.meshgrid(g, g, indexing="ij")
    xq = np.stack([GX.ravel(), GY.ravel(),
                   np.full(res * res, t_star)], 1)
    mean = np.asarray(gpquad.predict_mean(state, jnp.asarray(xq, dtype)),
                      np.float64) * y_std + y_mean
    truth = field(xq[:, 0], xq[:, 1], xq[:, 2])
    rmse = float(np.sqrt(np.mean((mean - truth) ** 2)))
    print(f"slice t={t_star}: RMSE vs truth {rmse:.3f} K "
          f"(noise 0.2 K, field spread {truth.std():.2f} K)")
    assert rmse < 0.2, "slice prediction must beat per-obs noise"

    # dense-GP oracle agreement on a subsample (same kernel/hypers)
    idx = rng.choice(n, 1200, replace=False)
    sub = rng.choice(res * res, 300, replace=False)
    K = np.asarray(kern.kernel_matrix(xj[idx], xj[idx]), np.float64)
    Ks = np.asarray(kern.kernel_matrix(jnp.asarray(xq[sub], dtype),
                                       xj[idx]), np.float64)
    dense = (Ks @ np.linalg.solve(K + 0.01 * np.eye(len(idx)),
                                  np.asarray(yn)[idx])) * y_std + y_mean
    diff = float(np.abs(dense - mean[sub]).mean())
    print(f"EFGP(n={n}) vs dense(1.2k subsample) mean |diff|: {diff:.3f} K")

    # posterior variance must grow inside the sensor-outage gap (one
    # stochastic diag-sums pass answers every target; its probe CG rides
    # the same deflation block)
    xq_gap = np.stack([GX.ravel()[:400], GY.ravel()[:400],
                       np.full(400, 0.675)], 1)     # gap center
    var_key = jax.random.PRNGKey(0)
    var_in = np.asarray(gpquad.predict_var(
        state, jnp.asarray(xq[sub], dtype), method="stochastic",
        key=var_key, probes=128), np.float64)
    var_gap = np.asarray(gpquad.predict_var(
        state, jnp.asarray(xq_gap, dtype), method="stochastic",
        key=var_key, probes=128), np.float64)
    print(f"mean posterior var: observed times {var_in.mean():.4f} "
          f"vs outage center {var_gap.mean():.4f}")
    assert var_gap.mean() > 2 * var_in.mean(), \
        "in-gap variance must exceed observed-time variance"
    print("PASS: spatiotemporal d=3 walkthrough")


if __name__ == "__main__":
    main()
