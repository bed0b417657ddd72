"""Real-data regression anchor: USA temperature stations.

Pins EFGP fit quality on the REAL dataset behind the reference's
committed CG-preconditioning CSV (reference
benchmark_cg_preconditioning_realdata.py:67-73), at the hyperparameters
the committed shootout learned (experiments/usa_temp_shootout.json:
EFGP val-RMSE 0.4108 vs dense 0.4120 vs SKI 0.4221 at 20 Adam iters).
The full hyper-learning run is minutes; this anchor refits at the
learned hypers (seconds) and pins the val RMSE.

Skips when the dataset file is not present (it ships with the mounted
reference checkout, not this repo).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, predict_mean
from gpquad.quadrature import spectral_grid


def _load():
    from gpquad.utils.loaders import load_usa_temp
    try:
        return load_usa_temp()
    except FileNotFoundError:
        pytest.skip("usa_temp_data.pt not available")


def test_usa_temp_efgp_anchor():
    x_all, y_all = _load()
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(y_all))
    n_val = int(round(0.2 * len(y_all)))
    vi, ti = perm[:n_val], perm[n_val:]
    x = jnp.asarray(x_all[ti])
    y = jnp.asarray(y_all[ti])
    xv = jnp.asarray(x_all[vi])
    # hypers from the committed shootout (experiments/usa_temp_shootout.json)
    ls, var, noise = 0.0338, 1.8711, 0.1362
    kernel = SquaredExponential(lengthscale=jnp.float64(ls),
                                variance=jnp.float64(var), dimension=2)
    _, h, mtot = spectral_grid(kernel, 1e-4, 1.0)
    st = fit_with_grid(x, y, kernel, jnp.float64(noise), jnp.float64(h),
                       int(mtot), cg_tol=1e-6, max_cg_iter=2000)
    mean = predict_mean(st, xv)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - y_all[vi]) ** 2)))
    # frozen anchor: 0.4108 from the shootout; allow solver/backend jitter
    assert rmse < 0.43, rmse
    assert rmse > 0.35, f"suspiciously low ({rmse}) — split or data changed"


def test_world_temp_efgp_anchor():
    """Second real-data anchor: worldwide station temperatures (n=12396,
    reference "Weather Data/datapull.ipynb" cell 11), at the hypers the
    committed shootout learned (experiments/world_temp_shootout.json:
    EFGP val-RMSE 0.2148 vs dense-on-4000-subsample 0.2340 vs SKI
    0.2508 at 20 Adam iters)."""
    from gpquad.utils.loaders import load_world_temp
    try:
        x_all, y_all = load_world_temp()
    except FileNotFoundError:
        pytest.skip("world_temp_data.pt not available")
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(y_all))
    n_val = int(round(0.2 * len(y_all)))
    vi, ti = perm[:n_val], perm[n_val:]
    x = jnp.asarray(x_all[ti])
    y = jnp.asarray(y_all[ti])
    xv = jnp.asarray(x_all[vi])
    ls, var, noise = 0.0320, 3.8211, 0.0371
    kernel = SquaredExponential(lengthscale=jnp.float64(ls),
                                variance=jnp.float64(var), dimension=2)
    _, h, mtot = spectral_grid(kernel, 1e-4, 1.0)
    st = fit_with_grid(x, y, kernel, jnp.float64(noise), jnp.float64(h),
                       int(mtot), cg_tol=1e-6, max_cg_iter=3000)
    mean = predict_mean(st, xv)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - y_all[vi]) ** 2)))
    # frozen anchor: 0.2148 from the shootout; allow solver/backend jitter
    assert rmse < 0.23, rmse
    assert rmse > 0.18, f"suspiciously low ({rmse}) — split or data changed"


def test_europe_pm25_efgp_anchor():
    """Third real-data anchor: European PM2.5 (reference "Weather Data/
    datapull.ipynb" cells 4-6), at the hypers the committed shootout
    learned (experiments/europe_pm25_shootout.json: EFGP 0.8844 ==
    full-data dense ceiling 0.8845 == SKI 0.8836 — the log1p target is
    noise-dominated, so matching the exact GP is the whole game)."""
    from gpquad.utils.loaders import load_europe_pm25
    try:
        x_all, y_all = load_europe_pm25()
    except FileNotFoundError:
        pytest.skip("X_europe.pt / y_europe.pt not available")
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(y_all))
    n_val = int(round(0.2 * len(y_all)))
    vi, ti = perm[:n_val], perm[n_val:]
    x = jnp.asarray(x_all[ti])
    y = jnp.asarray(y_all[ti])
    xv = jnp.asarray(x_all[vi])
    ls, var, noise = 0.0367, 1.2186, 0.8268
    kernel = SquaredExponential(lengthscale=jnp.float64(ls),
                                variance=jnp.float64(var), dimension=2)
    _, h, mtot = spectral_grid(kernel, 1e-4, 1.0)
    st = fit_with_grid(x, y, kernel, jnp.float64(noise), jnp.float64(h),
                       int(mtot), cg_tol=1e-6, max_cg_iter=2000)
    mean = predict_mean(st, xv)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - y_all[vi]) ** 2)))
    # frozen anchor: 0.8844 from the shootout
    assert rmse < 0.92, rmse
    assert rmse > 0.85, f"suspiciously low ({rmse}) — split or data changed"


def test_spatial_transcriptomics_pg_anchor():
    """PG classifier real-data anchor: Slc17a7 spatial transcriptomics
    (the dataset behind the reference's PG demo,
    reference polyagamma_classification/PG_GP_classification.ipynb cell 3).

    The spatial signal in this label is weak (k-NN coordinate ceiling
    ~0.72 AUC at full n, lower on subsets); the anchor pins that a short
    fixed-hyper fit extracts it: AUC well above chance and log-loss
    better than the base-rate predictor.  Full-run artifact:
    experiments/pg_spatial_transcriptomics.json.
    """
    from gpquad.models.pg import PolyagammaGPClassifier
    try:
        from gpquad.utils.loaders import load_spatial_transcriptomics
        x_all, y_all = load_spatial_transcriptomics(n_sub=4000, seed=0)
    except FileNotFoundError:
        pytest.skip("x.pt / y_slc17a7.pt not available")
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(y_all))
    vi, ti = perm[:800], perm[800:]
    x, y = x_all[ti], y_all[ti]
    xv, yv = x_all[vi], y_all[vi]
    clf = PolyagammaGPClassifier(max_iter=3, lr=0.0, lengthscale_init=0.1,
                                 random_state=0, dtype="float64")
    clf.fit(x, y)
    p = np.asarray(clf.predict_proba(xv))[:, 1]
    # AUC via rank-sum
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty(len(p)); ranks[order] = np.arange(1, len(p) + 1)
    pos = yv > 0.5
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert auc > 0.60, auc
    pc = np.clip(p, 1e-12, 1 - 1e-12)
    nll = -np.mean(yv * np.log(pc) + (1 - yv) * np.log(1 - pc))
    base = float(y.mean())
    base_nll = -np.mean(yv * np.log(base) + (1 - yv) * np.log(1 - base))
    assert nll < base_nll, (nll, base_nll)
