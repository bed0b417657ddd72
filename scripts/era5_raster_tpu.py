"""ERA5-shaped raster end-to-end on the TPU (VERDICT r4 #3).

The reference's flagship real problem is the ERA5 2m-temperature raster:
a 721 x 1440 global grid, ~1.04M points, loaded by
``era5_experiment/load_era5.py:16-69`` (h5py, longitude wrap, K -> C).
The raw file does not exist in this environment, so this script builds a
FORMAT-FAITHFUL synthetic stand-in at the full ERA5 dimensions — a
latitudinal climate profile plus multiscale spectral texture, written as
the same h5 layout — and pushes it through the real pipeline:

    loader (gpquad.utils.loaders.load_era5, full parse path)
      -> EFGP fit at n≈1.04M gridded points (banded NUFFT + Kronecker
         eigen-preconditioner; gridded points change the NUFFT band
         occupancy vs the i.i.d. clouds of the bench scale config)
      -> posterior mean + stochastic variance at held-out points
      -> hyper-learning (Adam on the log-marginal gradient)

Because the field is synthetic, accuracy is reported against the TRUE
(noise-free) field on the held-out set — a cleaner quality signal than
any real-data split can give.  Writes experiments/era5_raster_tpu.json.

Run (TPU): ``python scripts/era5_raster_tpu.py``
      CPU: ``python scripts/era5_raster_tpu.py --cpu --nlat 73 --nlon 144``
"""
import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def synth_era5_file(path, nlat=721, nlon=1440, seed=0, noise=0.5):
    """Write a synthetic ERA5-format h5 file and return the true field.

    The field is a zonal climate profile (warm equator, cold poles, in
    deg C) plus band-limited spectral texture at ~3-10 degree scales
    (power-law-filtered white noise via FFT — the same trick the
    repo's sampling module uses for spectral GP draws)."""
    import h5py
    rng = np.random.default_rng(seed)
    lat = np.linspace(90.0, -90.0, nlat)
    lon = np.arange(nlon) * (360.0 / nlon)
    LAT = lat[:, None] * np.ones((1, nlon))
    base = 30.0 * np.cos(np.deg2rad(LAT)) ** 2 - 25.0 * np.sin(
        np.deg2rad(LAT)) ** 4
    # band-limited texture: SE-spectrum filter, lengthscale ~4 degrees
    ell_deg = 4.0
    kx = np.fft.fftfreq(nlat, d=180.0 / nlat)
    ky = np.fft.fftfreq(nlon, d=360.0 / nlon)
    K2 = kx[:, None] ** 2 + ky[None, :] ** 2
    filt = np.exp(-np.pi ** 2 * ell_deg ** 2 * K2)
    white = rng.normal(size=(nlat, nlon))
    tex = np.real(np.fft.ifft2(np.fft.fft2(white) * filt))
    tex *= 8.0 / max(tex.std(), 1e-12)
    truth = base + tex
    t2m = truth + rng.normal(size=truth.shape) * noise + 273.15
    with h5py.File(path, "w") as f:
        f["t2m"] = t2m[None].astype(np.float64)      # (1, nlat, nlon)
        f["latitude"] = lat
        f["longitude"] = lon
    return truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlat", type=int, default=721)
    ap.add_argument("--nlon", type=int, default=1440)
    ap.add_argument("--noise", type=float, default=0.5)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--lengthscale0", type=float, default=4.0,
                    help="initial lengthscale, degrees")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--probes", type=int, default=256)
    ap.add_argument("--nval", type=int, default=20_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", type=str,
                    default=str(REPO / "experiments" / "era5_raster_tpu.json"))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from gpquad.kernels import HyperState, SquaredExponential
    from gpquad.models.efgp import (fit_with_grid, plan_nufft_caps,
                                    predict_mean, predict_var)
    from gpquad.models.gradient import gradient_with_grid
    from gpquad.quadrature import spectral_grid
    from gpquad.utils.loaders import load_era5

    t_all = time.time()
    with tempfile.TemporaryDirectory(prefix="era5_synth_") as tmp:
        p = os.path.join(tmp, "era5.nc")
        truth = synth_era5_file(p, args.nlat, args.nlon, noise=args.noise)
        t0 = time.time()
        x_all, y_all = load_era5(path=p)          # full ERA5 parse path
        load_s = time.time() - t0
    n_all = len(y_all)
    truth_flat = truth.ravel()
    assert x_all.shape == (n_all, 2)

    rng = np.random.default_rng(1)
    perm = rng.permutation(n_all)
    vi, ti = perm[:args.nval], perm[args.nval:]
    # degrees -> [0, 1]^2-ish (keeps quadrature planning isotropic enough;
    # lon in [-180, 180), lat in [-90, 90])
    scale = 360.0
    x = jnp.asarray(x_all[ti] / scale, jnp.float32)
    y_mean = float(np.mean(y_all[ti]))
    y = jnp.asarray(y_all[ti] - y_mean, jnp.float32)
    xv = jnp.asarray(x_all[vi] / scale, jnp.float32)
    tv = truth_flat[vi]
    yv = y_all[vi]

    @jax.jit
    def _reduce(a):
        return jnp.sum(jnp.abs(jnp.real(a)))

    def sync(a):
        return float(_reduce(a))

    out = {"device": str(jax.devices()[0]), "n": int(n_all),
           "n_train": int(len(ti)), "n_val": int(len(vi)),
           "raster": [args.nlat, args.nlon], "noise": args.noise,
           "eps": args.eps, "loader_parse_s": round(load_s, 2)}

    ell0 = args.lengthscale0 / scale
    var0 = float(np.var(y_all[ti]))
    sig0 = args.noise ** 2
    kernel = SquaredExponential(lengthscale=jnp.float32(ell0),
                                variance=jnp.float32(var0), dimension=2)
    _, h, mtot = spectral_grid(kernel, args.eps, 1.0)
    mtot = int(mtot)
    out["mtot"] = mtot
    out["M"] = mtot ** 2
    print(f"n={n_all} mtot={mtot} M={mtot**2}", flush=True)
    caps = plan_nufft_caps(x, float(h), mtot)

    def fit(kern, s2):
        # cg_tol 1e-5: at n~1e6 gridded points the f32 relative-residual
        # floor sits near 1e-6 — asking for 1e-6 burned the full 2000-
        # iteration cap for nothing the posterior can see (measured:
        # identical RMSE, fit 11.1 s -> ~1 s class)
        return fit_with_grid(x, y, kern, jnp.float32(s2), h, mtot,
                             cg_tol=1e-5, max_cg_iter=2000, solver="cg",
                             precond="kron", fft_smooth=True,
                             nufft_method="banded", nufft_caps=caps)

    t0 = time.time()
    st = fit(kernel, sig0)
    sync(st.beta)
    out["fit_compile_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    st = fit(kernel, sig0)
    mean_v = predict_mean(st, xv) + y_mean
    sync(mean_v)
    out["fit_mean_warm_s"] = round(time.time() - t0, 3)
    out["fit_cg_iters"] = int(st.mean_cg_iters)
    mh = np.asarray(mean_v, np.float64)
    out["val_rmse_vs_truth"] = round(
        float(np.sqrt(np.mean((mh - tv) ** 2))), 4)
    out["val_rmse_vs_noisy"] = round(
        float(np.sqrt(np.mean((mh - yv) ** 2))), 4)

    key = jax.random.PRNGKey(7)

    def var():
        return predict_var(st, xv[:1000], method="stochastic", key=key,
                           probes=args.probes, cg_tol=1e-3,
                           max_cg_iter=1000)
    v = var(); sync(v)
    t0 = time.time(); v = var(); sync(v)
    out["var_1000targets_s"] = round(time.time() - t0, 3)
    out["var_probes"] = args.probes
    vh = np.asarray(v, np.float64)
    out["var_range"] = [float(vh.min()), float(vh.max())]

    # hyper-learning: one jitted step per iteration (fixed plan)
    params = HyperState.create(kernel, sig0)
    tx = optax.adam(0.1)

    def _body(raw, opt_state, key, x, y, h):
        p = HyperState(raw=raw, names=params.names)
        res = gradient_with_grid(x, y, p.kernel_of(kernel), p.sig2, h, key,
                                 mtot=mtot, trace_samples=5, cg_tol=1e-3,
                                 max_cg_iter=500, solver="cg",
                                 precond="kron", fft_smooth=True,
                                 nufft_method="banded", nufft_caps=caps)
        grad_raw = res.grad * jnp.exp(raw)
        updates, opt_state = tx.update(grad_raw, opt_state, raw)
        return optax.apply_updates(raw, updates), opt_state

    step = jax.jit(_body)
    raw, ost = params.raw, tx.init(params.raw)
    kk = jax.random.PRNGKey(3)
    raw1, ost1 = step(raw, ost, kk, x, y, h)
    sync(raw1)
    t0 = time.time()
    for it in range(args.iters):
        raw, ost = step(raw, ost, jax.random.fold_in(kk, it), x, y, h)
    sync(raw)
    out["hyperlearn_iters"] = args.iters
    out["hyperlearn_s"] = round(time.time() - t0, 2)
    pos = np.exp(np.asarray(raw))
    out["learned_lengthscale_deg"] = round(float(pos[0]) * scale, 3)
    out["learned_variance"] = round(float(pos[1]), 4)
    out["learned_noise"] = round(float(pos[-1]), 5)

    # refit at the learned hypers
    kern2 = SquaredExponential(lengthscale=jnp.float32(pos[0]),
                               variance=jnp.float32(pos[1]), dimension=2)
    st2 = fit(kern2, float(pos[-1]))
    mean2 = np.asarray(predict_mean(st2, xv), np.float64) + y_mean
    out["val_rmse_vs_truth_learned"] = round(
        float(np.sqrt(np.mean((mean2 - tv) ** 2))), 4)
    out["total_s"] = round(time.time() - t_all, 2)

    # success criteria: the GP must beat the raw observation noise on the
    # held-out truth, and the learned lengthscale must land at the
    # texture scale (4 deg) rather than run away.  Only meaningful at
    # (near-)full ERA5 resolution: a coarse smoke raster undersamples the
    # 4-degree texture (grid spacing > lengthscale), so reconstruction
    # error is dominated by aliasing, not by the solver.
    full_res = args.nlat >= 361 and args.nlon >= 720
    out["pass_rmse"] = bool(out["val_rmse_vs_truth_learned"]
                            < 0.8 * args.noise)
    out["pass_lengthscale"] = bool(
        1.0 < out["learned_lengthscale_deg"] < 16.0)
    print(json.dumps(out, indent=1), flush=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    if full_res:
        assert out["pass_rmse"] and out["pass_lengthscale"], out
        print("PASS")
    else:
        print("SMOKE OK (coarse raster: accuracy criteria not scored)")


if __name__ == "__main__":
    main()
