"""Kernel zoo for the TPU-native EFGP framework."""
from __future__ import annotations

from .base import AbstractKernel, kernel_dataclass, median_distance_heuristic
from .matern import Matern
from .params import HyperState
from .squared_exponential import SquaredExponential

__all__ = [
    "AbstractKernel",
    "kernel_dataclass",
    "median_distance_heuristic",
    "Matern",
    "SquaredExponential",
    "HyperState",
    "make_kernel",
]


def make_kernel(name, dimension: int = 1, **kwargs):
    """String kernel factory, mirroring the reference's string dispatch in
    ``EFGPND.__init__`` (reference: efgpnd.py:400-416).

    Accepts "SquaredExponential"/"SE", "Matern12", "Matern32", "Matern52".
    """
    if not isinstance(name, str):
        return name
    key = name.lower()
    if key in ("squaredexponential", "se"):
        return SquaredExponential(dimension=dimension, **kwargs)
    if key == "matern12":
        return Matern(dimension=dimension, nu=0.5, **kwargs)
    if key == "matern32":
        return Matern(dimension=dimension, nu=1.5, **kwargs)
    if key == "matern52":
        return Matern(dimension=dimension, nu=2.5, **kwargs)
    raise ValueError(f"Unknown kernel type: {name}")
