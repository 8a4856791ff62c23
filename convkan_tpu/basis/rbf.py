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
    # static-center fast path: unrolling the centers into python scalars
    # keeps every intermediate at the activation rank, which XLA fuses into
    # one pass (the broadcast form materializes rank+1 intermediates; see
    # the identical fix in bspline.bspline_basis)
    try:
        centers = [float(v) for v in np.asarray(grid)]
    except Exception:
        centers = None
    if centers is not None:
        return jnp.stack(
            [jnp.exp(-jnp.square((x - c) / denominator)) for c in centers],
            axis=-1)
    grid = jnp.asarray(grid, dtype=x.dtype)
    z = (x[..., None] - grid) / denominator
    return jnp.exp(-jnp.square(z))
