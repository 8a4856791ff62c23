"""Pure basis-expansion functions for every KAN family.

Each function maps an input array `x` of any shape to a stacked basis
`(..., K)` on a new trailing axis (already squashed input where noted).
Recurrences are unrolled in Python over the small static degree so that XLA
sees a flat chain of fused element-wise ops — no scan, no dynamic shapes.

Numerics follow the PyTorch reference exactly; each function cites the
reference implementation it reproduces.
"""

from .bspline import bspline_basis, make_bspline_grid
from .rbf import rbf_basis
from .poly import (
    bernstein_basis,
    bessel_basis,
    chebyshev_basis,
    fibonacci_basis,
    gegenbauer_basis,
    gram_basis,
    hermite_basis,
    jacobi_basis,
    laguerre_basis,
    legendre_basis,
    lucas_basis,
    taylor_basis,
)
from .fourier import fourier_basis
from .relukan import relukan_basis
from .wavelet import wavelet, WAVELET_TYPES

__all__ = [
    "bspline_basis",
    "make_bspline_grid",
    "rbf_basis",
    "bernstein_basis",
    "bessel_basis",
    "chebyshev_basis",
    "fibonacci_basis",
    "gegenbauer_basis",
    "gram_basis",
    "hermite_basis",
    "jacobi_basis",
    "laguerre_basis",
    "legendre_basis",
    "lucas_basis",
    "taylor_basis",
    "fourier_basis",
    "relukan_basis",
    "wavelet",
    "WAVELET_TYPES",
]
