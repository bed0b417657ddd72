"""Frozen-dataset regression anchors.

Stands in for the reference's real-data quality anchors
(reference: oisst_experiment/diagnostics/oisst_probe_reuse_summary.json via
diagnose_probe_reuse.py — BASELINE.md val-RMSE rows 0.1300 EFGP /
0.1139 dense / 0.1713 SKI): hyper-learning on the committed synthetic
raster (data/frozen_raster_v1.npz, scripts/make_frozen_raster.py) must keep
hitting the recorded golden validation RMSE.  A fit-quality regression —
in the gradient estimator, the quadrature planner, the solvers, or the
optimizer glue — fails this test even when every unit oracle still passes.

The full three-way shootout (EFGP/dense/SKI, 20 iters, n=2000) lives in
scripts/shootout_efgp_ski_dense.py; this test runs a CI-sized slice.
"""
import hashlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.models.model import EFGP

DATA = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"

# golden values (recorded 2026-08-16, commit introducing this test)
FROZEN_SHA256_PREFIX = "9ab74f6d03ff5f95"
GOLDEN_VAL_RMSE = 0.1048        # EFGP, n=1000, 10 Adam iters, seed 0
GOLDEN_NOISE_FLOOR = 0.10       # the generator's observation noise


@pytest.fixture(scope="module")
def raster():
    assert DATA.exists(), "frozen raster artifact missing"
    digest = hashlib.sha256(DATA.read_bytes()).hexdigest()
    assert digest.startswith(FROZEN_SHA256_PREFIX), (
        "data/frozen_raster_v1.npz changed — the frozen anchor artifact "
        "must never be regenerated; golden values depend on it byte-for-byte")
    return np.load(DATA)


def test_efgp_hyper_learning_hits_golden_rmse(raster):
    x, y = raster["x_train"][:1000], raster["y_train"][:1000]
    xv, yv = raster["x_val"], raster["y_val"]
    model = EFGP(jnp.asarray(x), jnp.asarray(y), "SE", eps=1e-4,
                 opts={"cg_tolerance": 1e-6, "max_cg_iterations": 500},
                 key=jax.random.PRNGKey(0))
    model.optimize_hyperparameters(max_iters=10, lr=0.1, trace_samples=10)
    mean, _ = model.predict(jnp.asarray(xv), return_variance=False)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - yv) ** 2)))
    # quality must not regress: golden +5% absolute head-room (stochastic
    # probes are keyed, so drift here means a real behavior change)
    assert rmse < 1.05 * GOLDEN_VAL_RMSE, (rmse, GOLDEN_VAL_RMSE)
    # and it must genuinely approach the noise floor, not just match a
    # previously-bad number
    assert rmse < 1.10 * GOLDEN_NOISE_FLOOR


def test_learned_hypers_in_plausible_range(raster):
    """The generator draws from an SE GP with lengthscale 0.12 and noise
    0.10; learned hypers must land in the right neighbourhood."""
    x, y = raster["x_train"][:1000], raster["y_train"][:1000]
    model = EFGP(jnp.asarray(x), jnp.asarray(y), "SE", eps=1e-4,
                 opts={"cg_tolerance": 1e-6, "max_cg_iterations": 500},
                 key=jax.random.PRNGKey(0))
    model.optimize_hyperparameters(max_iters=10, lr=0.1, trace_samples=10)
    pos = np.exp(np.asarray(model.params.raw))
    assert 0.05 < pos[0] < 0.3, pos      # lengthscale near 0.12
    assert 0.002 < pos[-1] < 0.15, pos   # noise var heading toward 0.01
