"""df64 PG high-precision leg vs the numpy-f64 dense feature system.

The reference's PG estimators are float64 end-to-end
(reference pg_classifier.py:1094); these tests certify that
models/pg_high.pg_predict_high delivers the same <=1e-6-class agreement
with the f64 dense system that the regression side's df64 tier has
(test_precision.py / test_df64.py), and that the f32 core path agrees at
its expected ~1e-3..1e-4 class (convention cross-check).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpquad.kernels import SquaredExponential, Matern
from gpquad.models import pg_core as core
from gpquad.models.pg_high import pg_predict_high
from gpquad.quadrature import spectral_grid
from gpquad.utils.f64_oracles import (pg_beta_mean_f64, pg_f64_objects,
                                      pg_mean_f64, pg_var_f64)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _problem(rng, n=400, d=2, ell=0.25, var=2.0, eps=1e-4):
    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    kern = SquaredExponential(lengthscale=jnp.float32(ell),
                              variance=jnp.float32(var), dimension=d)
    _, h, mtot = spectral_grid(kern, eps, 1.0)
    # f32 posterior weights, as the VI fit would hand over
    delta = (0.1 + 0.15 * rng.uniform(size=n)).astype(np.float32)
    kappa = (rng.integers(0, 2, n) - 0.5).astype(np.float32)
    return x, kern, float(h), int(mtot), delta, kappa


def test_pg_high_beta_mean_and_predictions_match_f64(rng):
    x, kern, h, mtot, delta, kappa = _problem(rng)
    xt = rng.uniform(0.1, 0.9, size=(64, 2)).astype(np.float32)

    res = pg_predict_high(x, kern, h, mtot, delta, kappa, xt)
    obj = pg_f64_objects(x, delta, kern, h, mtot)
    beta64 = pg_beta_mean_f64(obj, kappa)
    mean64 = pg_mean_f64(obj, xt, beta64)
    var64 = pg_var_f64(obj, xt)

    beta_df = (np.asarray(res.beta, np.complex128)
               + np.asarray(res.beta_lo, np.complex128))
    rel_beta = (np.linalg.norm(beta_df - beta64)
                / np.linalg.norm(beta64))
    assert rel_beta < 1e-6, rel_beta

    mean_df = np.asarray(res.mean, np.float64)
    scale = np.max(np.abs(mean64))
    assert np.max(np.abs(mean_df - mean64)) / scale < 1e-6

    var_df = np.asarray(res.var, np.float64)
    assert np.max(np.abs(var_df - var64)) / np.max(var64) < 1e-6
    # pointwise relative too: the latent variance is bounded away from 0
    assert np.max(np.abs(var_df - var64) / var64) < 1e-5


def test_pg_high_bucketed_grid_masks_surplus_nodes(rng):
    """ADVICE r4 (medium): when mtot is a bucketed rung > 2*hm+1 the f32
    fit zeroes the surplus nodes (flat_grid_mask), so the df64 leg must
    solve the SAME masked system — ``hm`` threads the mask into the host
    tables.  Certify against the masked f64 oracle, and check the
    unmasked tables really do define a different system (the bug this
    guards against was invisible to unmasked-only tests)."""
    x, kern, h, mtot, delta, kappa = _problem(rng, n=350)
    hm = (mtot - 1) // 2
    mtot_b = 2 * (hm + 3) + 1          # bucketed rung: 3 surplus nodes/side
    xt = rng.uniform(0.1, 0.9, size=(48, 2)).astype(np.float32)

    res = pg_predict_high(x, kern, h, mtot_b, delta, kappa, xt, hm=hm)
    obj = pg_f64_objects(x, delta, kern, h, mtot_b, hm=hm)
    beta64 = pg_beta_mean_f64(obj, kappa)
    mean64 = pg_mean_f64(obj, xt, beta64)
    var64 = pg_var_f64(obj, xt)

    mean_df = np.asarray(res.mean, np.float64)
    assert np.max(np.abs(mean_df - mean64)) / np.max(np.abs(mean64)) < 1e-6
    var_df = np.asarray(res.var, np.float64)
    assert np.max(np.abs(var_df - var64)) / np.max(var64) < 1e-6

    # the masked system equals the unbucketed (mtot = 2hm+1) system: the
    # surplus nodes are an exact no-op
    obj0 = pg_f64_objects(x, delta, kern, h, mtot)
    beta0 = pg_beta_mean_f64(obj0, kappa)
    mean0 = pg_mean_f64(obj0, xt, beta0)
    assert np.max(np.abs(mean0 - mean64)) / np.max(np.abs(mean0)) < 1e-12

    # and the UNMASKED bucketed tables define a measurably different
    # system (this is what the unfixed code solved)
    obj_bad = pg_f64_objects(x, delta, kern, h, mtot_b)
    beta_bad = pg_beta_mean_f64(obj_bad, kappa)
    mean_bad = pg_mean_f64(obj_bad, xt, beta_bad)
    assert np.max(np.abs(mean_bad - mean64)) / np.max(np.abs(mean64)) > 1e-9


def test_pg_f32_core_agrees_with_f64_oracle_conventions(rng):
    """Sanity: the f32 production path lands at its expected ~1e-3 class
    against the SAME oracle (catches any sign/convention drift between
    the oracle and the device algebra)."""
    x, kern, h, mtot, delta, kappa = _problem(rng, n=300)
    xt = rng.uniform(0.1, 0.9, size=(32, 2)).astype(np.float32)
    sp = core.build_pg_spectral_state(jnp.asarray(x), kern,
                                      jnp.float32(h), mtot=mtot)
    beta32, _ = core.solve_beta_mean(sp, jnp.asarray(x),
                                     jnp.asarray(delta), jnp.asarray(kappa),
                                     cg_tol=1e-8)
    mean32 = np.asarray(core.predictive_mean(sp, jnp.asarray(xt), beta32))
    var32 = np.asarray(core.predictive_variance_exact(
        sp, jnp.asarray(x), jnp.asarray(delta), jnp.asarray(xt),
        cg_tol=1e-8))
    obj = pg_f64_objects(x, delta, kern, h, mtot)
    beta64 = pg_beta_mean_f64(obj, kappa)
    mean64 = pg_mean_f64(obj, xt, beta64)
    var64 = pg_var_f64(obj, xt)
    assert np.max(np.abs(mean32 - mean64)) / np.max(np.abs(mean64)) < 2e-3
    assert np.max(np.abs(var32 - var64)) / np.max(var64) < 2e-3


def test_pg_high_matern_and_1d(rng):
    """Matérn-3/2 kernel, d=1: the host-f64 tables cover the Matérn
    spectral density and the 1-D row builder."""
    n = 300
    x = rng.uniform(0, 1, size=(n, 1)).astype(np.float32)
    kern = Matern(lengthscale=jnp.float32(0.2), variance=jnp.float32(1.5),
                  nu=1.5, dimension=1)
    _, h, mtot = spectral_grid(kern, 1e-5, 1.0)
    delta = (0.1 + 0.15 * rng.uniform(size=n)).astype(np.float32)
    kappa = (rng.integers(0, 2, n) - 0.5).astype(np.float32)
    xt = rng.uniform(0.1, 0.9, size=(40, 1)).astype(np.float32)

    res = pg_predict_high(x, kern, float(h), int(mtot), delta, kappa, xt)
    obj = pg_f64_objects(x, delta, kern, float(h), int(mtot))
    beta64 = pg_beta_mean_f64(obj, kappa)
    mean64 = pg_mean_f64(obj, xt, beta64)
    var64 = pg_var_f64(obj, xt)
    assert (np.max(np.abs(np.asarray(res.mean, np.float64) - mean64))
            / np.max(np.abs(mean64)) < 1e-6)
    assert (np.max(np.abs(np.asarray(res.var, np.float64) - var64))
            / np.max(var64) < 1e-6)
