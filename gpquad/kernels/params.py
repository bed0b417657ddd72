"""Hyperparameter state: a flat log-space vector with named views.

TPU-native replacement for the reference's ``GPParams`` ``nn.Module``
(reference: kernels/kernel_params.py:9-55).  The reference stores hypers as a
single log-space ``nn.Parameter`` and threads a mutable back-pointer through
the kernel; here the state is an immutable pytree — optimizers (optax) update
``raw`` functionally, and :meth:`kernel_of` materializes a kernel with the
current positive values.

Layout matches the reference exactly: ``raw = log([kernel hypers..., sig2])``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["HyperState"]


@dataclasses.dataclass(frozen=True)
class HyperState:
    raw: jnp.ndarray                 # (H+1,) log-space; last entry = noise var
    names: Tuple[str, ...]           # kernel hyper names (static)

    # -- pytree registration -------------------------------------------------
    def tree_flatten(self):  # pragma: no cover - via register below
        return (self.raw,), self.names

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, kernel, sigmasq) -> "HyperState":
        """Pack ``kernel``'s hypers + noise variance into log space
        (parity: GPParams.__init__, kernel_params.py:10-45)."""
        vals = [jnp.asarray(v, dtype=jnp.result_type(float))
                for _, v in kernel.iter_hypers()]
        vals.append(jnp.asarray(sigmasq, dtype=jnp.result_type(float)))
        raw = jnp.log(jnp.stack(vals))
        return cls(raw=raw, names=tuple(kernel.hyper_names))

    @property
    def pos(self) -> jnp.ndarray:
        """Positive-space values ``exp(raw)`` (kernel_params.py:47-50)."""
        return jnp.exp(self.raw)

    @property
    def sig2(self) -> jnp.ndarray:
        """Noise variance, the last entry (kernel_params.py:52-55)."""
        return self.pos[-1]

    def kernel_of(self, template):
        """Return ``template`` kernel carrying this state's hyper values."""
        return template.with_hypers(self.pos)

    def replace_raw(self, raw) -> "HyperState":
        return dataclasses.replace(self, raw=raw)

    def clamp_min(self, name: str, min_value) -> "HyperState":
        """Lower-clamp one named hyper in positive space (used for the
        min-lengthscale constraint, reference efgpnd.py:1186-1195)."""
        idx = self.names.index(name)
        new_raw = self.raw.at[idx].set(
            jnp.maximum(self.raw[idx], jnp.log(min_value))
        )
        return self.replace_raw(new_raw)

    def as_dict(self):
        p = self.pos
        out = {n: p[i] for i, n in enumerate(self.names)}
        out["sigmasq"] = p[-1]
        return out


jax.tree_util.register_pytree_node(
    HyperState,
    lambda s: ((s.raw,), s.names),
    lambda names, leaves: HyperState(raw=leaves[0], names=names),
)
