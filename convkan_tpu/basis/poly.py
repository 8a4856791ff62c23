"""Polynomial-recurrence bases (12 families), unrolled for small degree.

All functions take the *already squashed* input (tanh/sigmoid/min-max is
applied by the caller — the reference sometimes interleaves dropout between
the squash and the recurrence) and return a stacked basis `(..., K)`.

Chebyshev is the exception: its squash (tanh → clamp → acos) is part of the
basis definition (layers/cheby_kan_layers.py:91-96) and is applied here.
"""

from __future__ import annotations

import jax.numpy as jnp


def chebyshev_basis(x, degree: int, epsilon: float = 1e-7):
    """T_n via the trig identity cos(n*acos(clamp(tanh x))).

    layers/cheby_kan_layers.py:91-96 (conv) and :22-32 (MLP).
    """
    t = jnp.tanh(x)
    theta = jnp.arccos(jnp.clip(t, -1.0 + epsilon, 1.0 - epsilon))
    return jnp.stack([jnp.cos(n * theta) for n in range(degree + 1)], axis=-1)


def chebyshev_basis_recurrence_list(x, degree: int, epsilon: float = 1e-7):
    """T_n via the three-term recurrence T_n = 2t T_{n-1} - T_{n-2} on
    t = clamp(tanh x).  Mathematically identical to `chebyshev_basis`
    (cos(n acos t) == T_n(t) for |t| <= 1) but avoids acos, which has no
    Pallas TPU lowering — used inside fused kernels; ~1 ulp from the trig
    form in f32."""
    t = jnp.clip(jnp.tanh(x), -1.0 + epsilon, 1.0 - epsilon)
    polys = [jnp.ones_like(t)]
    if degree >= 1:
        polys.append(t)
        for _ in range(2, degree + 1):
            polys.append(2.0 * t * polys[-1] - polys[-2])
    return polys


def legendre_basis_list(x, degree: int):
    """P_n = ((2n+1) x P_{n-1} - n P_{n-2}) / (n+1).

    layers/legendre_kan_layers.py:110-124.
    """
    polys = [jnp.ones_like(x)]
    if degree >= 1:
        polys.append(x)
        for n in range(1, degree):
            polys.append(((2.0 * n + 1.0) * x * polys[-1] - n * polys[-2]) / (n + 1.0))
    return polys


def gram_basis_cols(x, degree: int, beta_weights):
    """List form of `gram_basis` (same recurrence, same values)."""
    p0 = jnp.ones_like(x)
    if degree == 0:
        return [p0]
    p1 = x
    basis = [p0, p1]
    for i in range(2, degree + 1):
        n, m = i - 1, i
        coef = ((m + n) * (m - n) * n**2) / (m**2 / (4.0 * n**2 - 1.0))
        beta = coef * beta_weights[n]
        p2 = x * p1 - beta * p0
        basis.append(p2)
        p0, p1 = p1, p2
    return basis


def gram_basis(x, degree: int, beta_weights):
    """Gram polynomials with a *learnable* recurrence coefficient.

    p2 = x*p1 - beta(i-1, i)*p0 with
    beta(n, m) = ((m+n)(m-n)n^2) / (m^2/(4n^2-1)) * beta_weights[n]
    (layers/gram_kan_layers.py:150-170).  `beta_weights` has shape
    (degree+1,).
    """
    return jnp.stack(gram_basis_cols(x, degree, beta_weights), axis=-1)


def jacobi_basis_list(x, degree: int, a: float = 1.0, b: float = 1.0):
    """Jacobi P_n^{(a,b)} three-term recurrence
    (layers/jacobi_kan_layers.py:117-136)."""
    polys = [jnp.ones_like(x)]
    if degree >= 1:
        polys.append(((a - b) + (a + b + 2) * x) / 2)
        for i in range(2, degree + 1):
            theta_k = (2 * i + a + b) * (2 * i + a + b - 1) / (2 * i * (i + a + b))
            theta_k1 = (2 * i + a + b - 1) * (a * a - b * b) / (
                2 * i * (i + a + b) * (2 * i + a + b - 2)
            )
            theta_k2 = (i + a - 1) * (i + b - 1) * (2 * i + a + b) / (
                i * (i + a + b) * (2 * i + a + b - 2)
            )
            polys.append((theta_k * x + theta_k1) * polys[-1] - theta_k2 * polys[-2])
    return polys


def bernstein_basis(x, degree: int):
    """Bernstein polynomials via the reference's de-Casteljau-style in-place
    update (layers/bersnstein_kan_layers.py:120-139).

    Note the reference's buffer starts as all-ones and each sweep j updates
    only the first (degree+1-j) slots; we replicate that exact computation
    functionally (tests/test_math_oracle.py pins the resulting all-ones
    quirk).  Input must already be in [0, 1] (sigmoid squash).  The single
    implementation is bernstein_basis_list (the Pallas path consumes the
    list form)."""
    return jnp.stack(bernstein_basis_list(x, degree), axis=-1)


def bessel_basis_list(x, degree: int):
    """y_0=1, y_1=x+1, y_n=(2n-1) x y_{n-1} + y_{n-2}
    (layers/bessel_kan_layers.py:127-156)."""
    polys = [jnp.ones_like(x)]
    if degree >= 1:
        polys.append(x + 1.0)
        for i in range(2, degree + 1):
            polys.append((2 * i - 1) * x * polys[-1] + polys[-2])
    return polys


def fibonacci_basis_list(x, degree: int):
    """F_0=0, F_1=1, F_n = x F_{n-1} + F_{n-2}
    (layers/fibonacci_kan_layers.py:133-168).  The first basis channel is all
    zeros, as in the reference."""
    polys = [jnp.zeros_like(x)]
    if degree >= 1:
        polys.append(jnp.ones_like(x))
        for i in range(2, degree + 1):
            polys.append(x * polys[-1] + polys[-2])
    return polys


def gegenbauer_basis_list(x, degree: int, alpha: float):
    """C_0=1, C_1=2αx, C_{n+1} = (2(n+α) x C_n - (n+2α-1) C_{n-1})/(n+1)
    (layers/gegenbauer_kan_layers.py:133-156)."""
    polys = [jnp.ones_like(x)]
    if degree >= 1:
        polys.append(2.0 * alpha * x)
        for n in range(1, degree):
            t1 = 2.0 * (n + alpha) * x * polys[-1]
            t2 = (n + 2.0 * alpha - 1.0) * polys[-2]
            polys.append((t1 - t2) / (n + 1))
    return polys


def hermite_basis_list(x, degree: int):
    """Physicists' Hermite: H_0=1, H_1=2x, H_n = 2x H_{n-1} - 2(n-1) H_{n-2}
    (layers/hermite_kan_layers.py:117-148)."""
    polys = [jnp.ones_like(x)]
    if degree >= 1:
        polys.append(2.0 * x)
        for i in range(2, degree + 1):
            polys.append(2.0 * x * polys[-1] - 2.0 * (i - 1) * polys[-2])
    return polys


def laguerre_basis_list(x, degree: int, alpha: float):
    """Generalized Laguerre: L_0=1, L_1=1+α-x,
    k L_k = (2k-1+α-x) L_{k-1} - (k-1+α) L_{k-2}
    (layers/laguerre_kan_layers.py:132-167)."""
    polys = [jnp.ones_like(x)]
    if degree >= 1:
        polys.append((1.0 + alpha) - x)
        for k in range(2, degree + 1):
            t1 = (2 * (k - 1) + 1 + alpha - x) * polys[-1]
            t2 = (k - 1 + alpha) * polys[-2]
            polys.append((t1 - t2) / k)
    return polys


def lucas_basis_list(x, degree: int):
    """L_0=2, L_1=x, L_n = x L_{n-1} + L_{n-2}
    (layers/lucas_kan_layers.py:146-170)."""
    polys = [2.0 * jnp.ones_like(x)]
    if degree >= 1:
        polys.append(x)
        for i in range(2, degree + 1):
            polys.append(x * polys[-1] + polys[-2])
    return polys


def taylor_basis(x, degree: int):
    """Monomials [1, x, x^2, ..., x^{degree-1}] — `degree` is the number of
    terms, not the max power (layers/taylor_kan_layers.py:130-152).  Slots
    beyond 0 are filled only when degree > 1, matching the reference's
    zero-init buffer semantics for degree == 1."""
    if degree <= 0:
        return jnp.zeros(x.shape + (0,), x.dtype)
    return jnp.stack(taylor_basis_list(x, degree), axis=-1)


def _stacked(list_fn):
    def fn(x, *args, **kwargs):
        return jnp.stack(list_fn(x, *args, **kwargs), axis=-1)
    fn.__name__ = list_fn.__name__.replace("_list", "")
    return fn


def bernstein_basis_list(x, degree: int):
    """The de-Casteljau sweep (single implementation; bernstein_basis
    stacks it)."""
    cols = [jnp.ones_like(x) for _ in range(degree + 1)]
    for j in range(1, degree + 1):
        num_updates = degree + 1 - j
        new_cols = [cols[i] * (1 - x) + cols[i + 1] * x
                    for i in range(num_updates)]
        cols = new_cols + cols[num_updates:]
    return cols


def taylor_basis_list(x, degree: int):
    """List form of `taylor_basis` (monomials of tanh-squashed input except
    the raw-ones slot 0)."""
    polys = [jnp.ones_like(x)]
    if degree > 1:
        polys.append(x)
        for i in range(2, degree):
            polys.append(polys[-1] * x)
    else:
        polys += [jnp.zeros_like(x)] * (degree - 1)
    return polys[:degree]


def fourier_basis_list(x, grid_size: int):
    """Single implementation; fourier.fourier_basis stacks it."""
    cos = [jnp.cos(float(k) * x) for k in range(1, grid_size + 1)]
    sin = [jnp.sin(float(k) * x) for k in range(1, grid_size + 1)]
    return cos + sin


# Stacked views (public API / jnp path)
chebyshev_basis_recurrence = _stacked(chebyshev_basis_recurrence_list)
legendre_basis = _stacked(legendre_basis_list)
jacobi_basis = _stacked(jacobi_basis_list)
bessel_basis = _stacked(bessel_basis_list)
fibonacci_basis = _stacked(fibonacci_basis_list)
gegenbauer_basis = _stacked(gegenbauer_basis_list)
hermite_basis = _stacked(hermite_basis_list)
laguerre_basis = _stacked(laguerre_basis_list)
lucas_basis = _stacked(lucas_basis_list)
