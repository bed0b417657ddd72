"""Satellite CO2 swath mapping: EFGP on orbit-track data (co2_exploration).

Script form of the reference's co2_experiment/co2_exploration.ipynb, which
fits 100k OCO-2 soundings (lon/lat -> CO2 ppm): normalize inputs to [0,1],
standardize the response, learn (lengthscale, variance, noise) with Adam
(eps=1e-4, trace_samples=1, cg_tol=1e-5, lr=0.1 — notebook cells 7-8),
then render the posterior mean on a 200x200 grid (cell 11) and sanity-check
against a dense GP on a small subsample (cell 13).

The real loader (load_co2.py) reads a local binary; here we synthesize an
OCO-2-like acquisition: soundings along sun-synchronous ground tracks
(narrow swaths, large unobserved gaps between tracks) of a smooth CO2
field with a latitudinal gradient plus regional enhancements.  The swath
geometry is the interesting part — the GP must interpolate across empty
inter-track bands.

Run: ``python examples/co2_swath.py [--cpu] [--n 20000]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def co2_field(lon, lat):
    """Smooth synthetic XCO2 (ppm): background + latitude gradient + blobs."""
    import numpy as np
    f = 415.0 + 2.5 * np.sin(np.radians(lat))          # hemispheric gradient
    for (lo0, la0, amp, sc) in [(-60, 45, 1.8, 18), (110, 30, 2.4, 14),
                                (20, -10, -1.2, 22), (-100, 35, 1.5, 12)]:
        f = f + amp * np.exp(-(((lon - lo0) / sc) ** 2
                               + ((lat - la0) / sc) ** 2))
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=20000)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import gpquad
    from gpquad.kernels import SquaredExponential

    dtype = jnp.float64 if args.cpu else jnp.float32
    rng = np.random.default_rng(11)

    # --- synthetic OCO-2 acquisition: 14 ascending tracks over a region ---
    n = args.n
    track = rng.integers(0, 14, size=n)
    lat = rng.uniform(-50, 60, size=n)
    lon0 = -180 + (track + 0.5) * (360 / 14)            # track centers
    lon = lon0 + 8.0 * np.sin(np.radians(lat) * 2) \
        + rng.normal(scale=0.6, size=n)                  # narrow swath
    lon = (lon + 180) % 360 - 180
    co2 = co2_field(lon, lat) + 0.5 * rng.normal(size=n)  # ~0.5 ppm noise
    print(f"soundings: n={n}, CO2 range {co2.min():.1f} - {co2.max():.1f} ppm")

    # --- notebook cell 5: normalize x to [0,1]^2, standardize y ------------
    x = np.stack([lon, lat], 1)
    x_min, x_max = x.min(0), x.max(0)
    xn = (x - x_min) / (x_max - x_min)
    y_mean, y_std = co2.mean(), co2.std()
    yn = (co2 - y_mean) / y_std

    xj = jnp.asarray(xn, dtype)
    yj = jnp.asarray(yn, dtype)

    # --- notebook cells 7-8: EFGP + Adam ----------------------------------
    kern = SquaredExponential(lengthscale=0.1, variance=1.0, dimension=2)
    model = gpquad.EFGP(xj, yj, kern, sigmasq=0.05, eps=1e-4,
                        estimate_params=False)
    model.optimize_hyperparameters(max_iters=30, lr=0.1, trace_samples=1,
                                   cg_tol=1e-5, key=jax.random.PRNGKey(0))
    hyp = {k: float(v) for k, v in model.params.as_dict().items()}
    print("learned:", {k: round(v, 4) for k, v in hyp.items()})

    # --- notebook cell 11: 200x200 posterior-mean map ----------------------
    res = 200
    gl = np.linspace(0, 1, res)
    GLON, GLAT = np.meshgrid(gl, gl, indexing="ij")
    xq = jnp.asarray(np.stack([GLON.ravel(), GLAT.ravel()], 1), dtype)
    mean, _ = model.predict(xq, return_variance=False)
    co2_map = np.asarray(mean, np.float64) * y_std + y_mean

    lon_g = GLON.ravel() * (x_max[0] - x_min[0]) + x_min[0]
    lat_g = GLAT.ravel() * (x_max[1] - x_min[1]) + x_min[1]
    truth = co2_field(lon_g, lat_g)
    rmse = float(np.sqrt(np.mean((co2_map - truth) ** 2)))
    print(f"map RMSE vs true field: {rmse:.3f} ppm "
          f"(noise 0.5 ppm, field spread {truth.std():.2f} ppm)")
    assert rmse < 0.5, "map must beat per-sounding noise"

    # --- notebook cell 13: dense-GP cross-check on a small subsample -------
    idx = rng.choice(n, 1500, replace=False)
    sub_pred_idx = rng.choice(res * res, 400, replace=False)
    s2 = hyp["sigmasq"]
    kern_l = SquaredExponential(lengthscale=hyp["lengthscale"],
                                variance=hyp["variance"], dimension=2)
    K = np.asarray(kern_l.kernel_matrix(xj[idx], xj[idx]), np.float64)
    Ks = np.asarray(kern_l.kernel_matrix(xq[sub_pred_idx], xj[idx]),
                    np.float64)
    dense = Ks @ np.linalg.solve(K + s2 * np.eye(len(idx)),
                                 np.asarray(yn[np.asarray(idx)]))
    dense_ppm = dense * y_std + y_mean
    diff = np.abs(dense_ppm - co2_map[sub_pred_idx]).mean()
    print(f"EFGP(20k) vs dense GP(1.5k subsample), mean |diff|: "
          f"{diff:.3f} ppm")
    print("PASS: co2 swath walkthrough")


if __name__ == "__main__":
    main()
