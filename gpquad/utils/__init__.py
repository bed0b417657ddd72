"""Utilities: dataset loaders, dense gradient oracles, profiling scopes."""
from .loaders import (data_dir, load_co2, load_era5, load_oisst,
                      load_oisst_grid, load_prism, load_prism_dataset,
                      load_roads, load_synthetic_gp, load_taxi)

__all__ = [
    "data_dir", "load_co2", "load_era5", "load_oisst", "load_oisst_grid",
    "load_prism", "load_prism_dataset", "load_roads", "load_synthetic_gp",
    "load_taxi",
]
