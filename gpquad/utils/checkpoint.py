"""Checkpoint / resume (aux subsystem §5 — absent in the reference).

The reference has no persistence; the closest analogues are its in-memory
fit caches and CG warm starts (SURVEY §5).  Here training state —
hyperparameters, optimizer state, warm-start solver vectors, history — is
saved with Orbax so long hyper-learning runs survive preemption, which is
the operational norm for TPU fleets.

The saved tree is plain arrays + metadata; ``save``/``restore`` work for
both the EFGP facade and the PG estimators.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "save_efgp",
           "restore_efgp"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path, tree: Dict[str, Any], *, metadata: Optional[Dict] = None):
    """Save a pytree of arrays (+ JSON metadata sidecar) to ``path``."""
    path = Path(path).absolute()
    # complex leaves can't cross the axon host boundary; split them
    def split(x):
        if jnp.iscomplexobj(x):
            return {"__complex_re__": jnp.real(x), "__complex_im__": jnp.imag(x)}
        return x
    tree = jax.tree_util.tree_map(split, tree,
                                  is_leaf=lambda x: hasattr(x, "dtype"))
    _checkpointer().save(path, tree, force=True)
    if metadata is not None:
        (path / "gpquad_meta.json").write_text(json.dumps(metadata))
    return path


def restore_checkpoint(path) -> Dict[str, Any]:
    path = Path(path).absolute()
    tree = _checkpointer().restore(path)
    tree = _join_complex(tree)
    meta_p = path / "gpquad_meta.json"
    if meta_p.exists():
        tree["__metadata__"] = json.loads(meta_p.read_text())
    return tree


def _join_complex(node):
    if isinstance(node, dict):
        if "__complex_re__" in node:
            return np.asarray(node["__complex_re__"]) \
                + 1j * np.asarray(node["__complex_im__"])
        return {k: _join_complex(v) for k, v in node.items()}
    return node


# ---------------------------------------------------------------------------
# EFGP model convenience wrappers
# ---------------------------------------------------------------------------

def save_efgp(model, path):
    """Persist an :class:`gpquad.EFGP`'s learnable/warm-start state."""
    tree = {
        "raw": model.params.raw,
        "key": model.key,
    }
    if model._last_gradient_beta is not None:
        tree["last_gradient_beta"] = model._last_gradient_beta
    meta = {
        "names": list(model.params.names),
        "eps": model.eps,
        "opts": {k: v for k, v in model.opts.items()
                 if isinstance(v, (int, float, str, bool, type(None)))},
        "training_log": {k: v for k, v in model.training_log.items()
                         if k != "gradients"},
    }
    return save_checkpoint(path, tree, metadata=meta)


def restore_efgp(model, path):
    """Restore state saved by :func:`save_efgp` into ``model`` (same data /
    kernel family).  Returns the model."""
    tree = restore_checkpoint(path)
    raw = jnp.asarray(tree["raw"])
    model.params = model.params.replace_raw(raw)
    if "key" in tree:
        model.key = jnp.asarray(tree["key"])
    if "last_gradient_beta" in tree:
        model._last_gradient_beta = jnp.asarray(tree["last_gradient_beta"])
    meta = tree.get("__metadata__", {})
    if meta.get("training_log"):
        model.training_log = meta["training_log"]
    model._state = None          # force refit with restored hypers
    model._fitted_raw = None
    return model
