"""Gaussian radial basis functions (FastKAN).

Reproduces utils/utils.py:19-33: fixed linspace grid of `num_grids` centers
over [grid_min, grid_max], denominator = (max-min)/(num_grids-1) unless
overridden, basis = exp(-((x - c)/denom)^2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_rbf_grid(grid_min: float = -2.0, grid_max: float = 2.0, num_grids: int = 8):
    return np.linspace(grid_min, grid_max, num_grids, dtype=np.float32)


def rbf_basis(x, grid, denominator: float):
    grid = jnp.asarray(grid, dtype=x.dtype)
    z = (x[..., None] - grid) / denominator
    return jnp.exp(-jnp.square(z))
