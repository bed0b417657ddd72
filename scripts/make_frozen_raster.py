"""Generate the frozen synthetic raster regression anchor.

Stands in for the reference's OISST/usa_temp real-data anchors
(reference: oisst_experiment/diagnose_probe_reuse.py and
diagnostics/oisst_probe_reuse_summary.json — BASELINE.md rows quoting
val-RMSE 0.1300 EFGP / 0.1139 dense / 0.1713 SKI): a deterministic
smooth 2-D field sampled at scattered points with observation noise,
split train/val, written once to ``data/frozen_raster_v1.npz`` and
committed so quality regressions are detectable forever.

The field is a fixed-seed random-Fourier-features draw from an SE-spectrum
GP (lengthscale 0.12, unit variance) — pure NumPy so the artifact does not
depend on any framework code that might change.

Run: ``python scripts/make_frozen_raster.py`` (refuses to overwrite).
"""
import sys
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"

LENGTHSCALE = 0.12
NOISE = 0.10
N_TRAIN = 2000
N_VAL = 500
N_FEATURES = 400
SEED = 20260816


def field(xy: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random-Fourier-feature GP draw: f(x) = sqrt(2/F) sum cos(2pi w.x + b),
    w ~ N(0, 1/(2 pi l)^2) matching the SE spectral density."""
    w = rng.normal(0.0, 1.0 / (2.0 * np.pi * LENGTHSCALE),
                   size=(N_FEATURES, 2))
    b = rng.uniform(0.0, 2.0 * np.pi, size=N_FEATURES)
    return np.sqrt(2.0 / N_FEATURES) * np.cos(
        2.0 * np.pi * xy @ w.T + b).sum(axis=1) / np.sqrt(1.0)


def main() -> None:
    if OUT.exists():
        sys.exit(f"{OUT} already exists; the frozen artifact must not change.")
    rng = np.random.default_rng(SEED)
    n = N_TRAIN + N_VAL
    xy = rng.uniform(0.0, 1.0, size=(n, 2))
    # normalize the draw to ~unit variance like the reference standardizes
    f = field(xy, rng)
    f = (f - f.mean()) / f.std()
    y = f + NOISE * rng.normal(size=n)
    perm = rng.permutation(n)
    tr, va = perm[:N_TRAIN], perm[N_TRAIN:]
    OUT.parent.mkdir(exist_ok=True)
    np.savez_compressed(
        OUT,
        x_train=xy[tr].astype(np.float64), y_train=y[tr].astype(np.float64),
        x_val=xy[va].astype(np.float64), y_val=y[va].astype(np.float64),
        f_val=f[va].astype(np.float64),
        meta=np.asarray([LENGTHSCALE, NOISE, SEED], np.float64))
    print(f"wrote {OUT} ({OUT.stat().st_size/1024:.1f} KiB)")


if __name__ == "__main__":
    main()
