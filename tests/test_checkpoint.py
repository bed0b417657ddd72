"""Checkpoint/resume tests (new capability; SURVEY §5 aux subsystems)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpquad.models.model import EFGP
from gpquad.utils.checkpoint import (restore_checkpoint, restore_efgp,
                                     save_checkpoint, save_efgp)


def test_checkpoint_roundtrip_arrays(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))},
            "z": jnp.arange(4) + 1j * jnp.arange(4)}
    save_checkpoint(tmp_path / "ck", tree, metadata={"note": "hi"})
    back = restore_checkpoint(tmp_path / "ck")
    assert np.allclose(np.asarray(back["a"]), np.arange(5.0))
    assert np.allclose(np.asarray(back["b"]["c"]), 1.0)
    assert np.allclose(np.asarray(back["z"]), np.arange(4) + 1j * np.arange(4))
    assert back["__metadata__"]["note"] == "hi"


def test_efgp_resume(tmp_path, rng):
    x = jnp.asarray(rng.uniform(0, 1, (80, 1)))
    y = jnp.asarray(rng.normal(size=80))
    m = EFGP(x, y, "SE", sigmasq=0.1, eps=1e-3, estimate_params=False)
    m.optimize_hyperparameters(max_iters=3, trace_samples=2,
                               key=jax.random.PRNGKey(0))
    save_efgp(m, tmp_path / "ck")

    m2 = EFGP(x, y, "SE", sigmasq=0.5, eps=1e-3, estimate_params=False)
    restore_efgp(m2, tmp_path / "ck")
    assert np.allclose(np.asarray(m.params.raw), np.asarray(m2.params.raw))
    mean1, _ = m.predict(x[:5])
    mean2, _ = m2.predict(x[:5])
    assert np.allclose(np.asarray(mean1), np.asarray(mean2))
    # resumed model continues training without error
    m2.optimize_hyperparameters(max_iters=1, trace_samples=2,
                                key=jax.random.PRNGKey(1))
