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


def rbf_cols(x, grid, denominator: float):
    """Static-center RBF expansion as a LIST of per-center columns (the
    degree-major layout the fast paths concatenate on the lane axis), or
    None when the centers cannot be lifted to python scalars (traced
    grid_override).  Single source of the exp(-((x-c)/denom)^2) fast
    path — kan_linear.py and kan_conv._expand_cols both consume it, and
    rbf_basis stacks it; keep the numerics identical everywhere."""
    try:
        centers = [float(v) for v in np.asarray(grid)]
    except Exception:
        return None
    return [jnp.exp(-jnp.square((x - c) / denominator)) for c in centers]


def rbf_basis(x, grid, denominator: float):
    # static-center fast path: unrolling the centers into python scalars
    # keeps every intermediate at the activation rank, which XLA fuses into
    # one pass (the broadcast form materializes rank+1 intermediates; see
    # the identical fix in bspline.bspline_basis)
    cols = rbf_cols(x, grid, denominator)
    if cols is not None:
        return jnp.stack(cols, axis=-1)
    grid = jnp.asarray(grid, dtype=x.dtype)
    z = (x[..., None] - grid) / denominator
    return jnp.exp(-jnp.square(z))
