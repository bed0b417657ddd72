"""Stellar light-curve smoothing with EFGP (script form of the reference's
lightcurves/lightcurve_ex.ipynb, which fits Kepler-17 long-cadence
photometry: normalize t and flux, Adam hyper-learning with a noise floor,
then a dense posterior-mean curve; reference cells drive
EFGPND.compute_gradients with trace_samples=1, cg_tol=1e-6,
noise_floor=1e-1).

The notebook downloads real Kepler data via lightkurve (network); this
walkthrough synthesizes an equivalent series — a quasi-periodic spot
signal (rotation period ~12 d, slowly drifting amplitude/phase) sampled
at long cadence with quarter-sized data gaps — so it runs hermetically.
The GP workflow is identical: rescale inputs to [0, 1], standardize flux,
learn (lengthscale, variance, noise) by Adam on the marginal-likelihood
gradients, and read the posterior mean on a 5000-point uniform grid,
including inside the gaps.

Run: ``python examples/lightcurve.py [--cpu]``
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
    import gpquad
    from gpquad.kernels import SquaredExponential

    dtype = jnp.float64 if args.cpu else jnp.float32
    rng = np.random.default_rng(7)

    # --- synthetic Kepler-like light curve --------------------------------
    # ~4 years of 29.4-min long cadence, thinned to keep the demo quick.
    t_all = np.arange(0.0, 1400.0, 0.0204 * 24)     # ~1 sample / 0.49 d
    # quasi-periodic starspot signal: rotation ~12.26 d (Kepler-17), with
    # slow amplitude and phase drift as spots evolve
    P = 12.26
    amp = 1.0 + 0.35 * np.sin(2 * np.pi * t_all / 290.0)
    phase = 0.25 * np.sin(2 * np.pi * t_all / 410.0)
    f_true = 0.01 * amp * np.sin(2 * np.pi * (t_all / P + phase)) \
        + 0.004 * np.sin(4 * np.pi * (t_all / P + phase) + 0.7)
    # quarter gaps (downlinks): drop three multi-day windows
    f_full = f_true.copy()                       # noise-free, gap-free truth
    keep = np.ones(len(t_all), bool)
    for lo, hi in [(330, 360), (700, 745), (1050, 1080)]:
        keep &= ~((t_all > lo) & (t_all < hi))
    t, f_true = t_all[keep], f_true[keep]
    # Kepler long-cadence photometric precision on a V~14 star is a few
    # 1e-4 relative, far below a percent-level spot signal.
    noise_sd = 5e-4
    y_raw = 1.0 + f_true + noise_sd * rng.normal(size=len(t))
    print(f"light curve: n={len(t)} span={t[-1]-t[0]:.0f} d, "
          f"3 gaps, S/N~{np.std(f_true)/noise_sd:.1f}")

    # --- normalize exactly as the notebook does ---------------------------
    x = (t - t.min()) / (t.max() - t.min())
    y_mean, y_std = y_raw.mean(), y_raw.std()
    yn = (y_raw - y_mean) / y_std

    xj = jnp.asarray(x, dtype)
    yj = jnp.asarray(yn, dtype)

    # Init the lengthscale near the (known) rotation timescale: the default
    # median heuristic lands ~0.3 in normalized units — far too smooth to
    # see a 0.009-unit oscillation, a local optimum where all signal is
    # explained as noise.  The notebook's real light curve has power at
    # long timescales so the default works there; periodic synthetic data
    # needs an informed start (standard GP practice).
    kern = SquaredExponential(lengthscale=jnp.asarray(0.0015, dtype),
                              variance=jnp.asarray(1.0, dtype), dimension=1)
    model = gpquad.EFGP(xj, yj, kern, sigmasq=0.01, eps=1e-4,
                        estimate_params=False)
    # The default min_lengthscale clamp (5e-3, matching the reference's
    # optimize_hyperparameters) sits ABOVE the rotation timescale in
    # normalized units — loosen it so the optimizer can resolve the signal.
    model.optimize_hyperparameters(
        max_iters=50, lr=0.05, trace_samples=1, cg_tol=1e-6,
        noise_floor=1e-4, min_lengthscale=2e-4, key=jax.random.PRNGKey(0))
    hyp = {k: float(v) for k, v in model.params.as_dict().items()}
    print("learned:", {k: round(v, 4) for k, v in hyp.items()})
    # rotation-scale structure: learned lengthscale should resolve the
    # ~12 d period, i.e. be well below it in normalized units
    ell_days = hyp["lengthscale"] * (t.max() - t.min())
    print(f"lengthscale = {ell_days:.2f} d (rotation period {P} d)")
    assert ell_days < P, "GP must resolve the rotation signal"

    # --- dense posterior mean, including across the gaps ------------------
    xq = jnp.asarray(np.linspace(0, 1, 5000), dtype)
    mean, _ = model.predict(xq, return_variance=False)
    flux_pred = np.asarray(mean) * y_std + y_mean
    t_pred = np.asarray(xq) * (t.max() - t.min()) + t.min()

    truth_q = 1.0 + np.interp(t_pred, t_all, f_full)
    in_gap = np.zeros(len(t_pred), bool)
    for lo, hi in [(330, 360), (700, 745), (1050, 1080)]:
        in_gap |= (t_pred > lo) & (t_pred < hi)
    rmse_data = float(np.sqrt(np.mean(
        (flux_pred - truth_q)[~in_gap] ** 2)))
    rmse_gap = float(np.sqrt(np.mean((flux_pred - truth_q)[in_gap] ** 2)))
    print(f"posterior-mean RMSE vs truth: on-data {rmse_data:.5f}, "
          f"in-gap {rmse_gap:.5f} (noise level {noise_sd})")
    assert rmse_data < noise_sd, "smoothing must beat the raw noise level"
    print("PASS: lightcurve walkthrough")


if __name__ == "__main__":
    main()
