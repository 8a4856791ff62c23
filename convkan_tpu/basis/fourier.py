"""Fourier feature basis: [cos(kx) for k=1..G] ++ [sin(kx) for k=1..G].

Reproduces layers/fourier_kan_layers.py:163-187 — cos block first, then sin
block, concatenated on the basis axis (so the per-channel inner order is
cos_1..cos_G, sin_1..sin_G).
"""

from __future__ import annotations

import jax.numpy as jnp


def fourier_basis(x, grid_size: int):
    # unrolled over the (small, static) frequency count: no constant arange
    # array, so the same function also runs inside Pallas kernels
    cos = [jnp.cos(float(k) * x) for k in range(1, grid_size + 1)]
    sin = [jnp.sin(float(k) * x) for k in range(1, grid_size + 1)]
    return jnp.stack(cos + sin, axis=-1)
