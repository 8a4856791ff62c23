"""Fourier feature basis: [cos(kx) for k=1..G] ++ [sin(kx) for k=1..G].

Reproduces layers/fourier_kan_layers.py:163-187 — cos block first, then sin
block, concatenated on the basis axis (so the per-channel inner order is
cos_1..cos_G, sin_1..sin_G).
"""

from __future__ import annotations

import jax.numpy as jnp


def fourier_basis(x, grid_size: int):
    # unrolled over the (small, static) frequency count: no constant arange
    # array, so the same function also runs inside Pallas kernels.  Single
    # implementation: poly.fourier_basis_list (imported lazily to avoid a
    # module cycle).
    from .poly import fourier_basis_list

    return jnp.stack(fourier_basis_list(x, grid_size), axis=-1)
