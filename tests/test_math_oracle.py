"""Reference-INDEPENDENT validation: the basis functions against their
mathematical definitions (scipy.special / closed forms), in f64.

The golden suite pins us to the torch reference; this suite pins the
shared math underneath BOTH implementations, so a bug the reference also
has cannot hide (and where the reference is intentionally buggy —
Bernstein — the quirk is pinned explicitly as a quirk)."""

from math import comb, factorial

import jax.numpy as jnp
import numpy as np
import pytest

scipy_special = pytest.importorskip("scipy.special")

from convkan_tpu.basis import bspline, poly

T = np.linspace(-0.9, 0.9, 13)
DEG = 5
ATOL = 1e-11


def _stacked(lst):
    return np.asarray(jnp.stack(lst, axis=-1))


def _check(got, oracle_fn):
    got = np.asarray(got)
    want = np.stack([oracle_fn(n) for n in range(got.shape[-1])], -1)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-11)


def test_legendre_matches_scipy():
    _check(_stacked(poly.legendre_basis_list(jnp.asarray(T), DEG)),
           lambda n: scipy_special.eval_legendre(n, T))


@pytest.mark.parametrize("a,b", [(1.0, 1.0), (0.5, 2.0)])
def test_jacobi_matches_scipy(a, b):
    _check(_stacked(poly.jacobi_basis_list(jnp.asarray(T), DEG, a, b)),
           lambda n: scipy_special.eval_jacobi(n, a, b, T))


@pytest.mark.parametrize("alpha", [0.5, 1.5])
def test_gegenbauer_matches_scipy(alpha):
    _check(_stacked(poly.gegenbauer_basis_list(jnp.asarray(T), DEG, alpha)),
           lambda n: scipy_special.eval_gegenbauer(n, alpha, T))


def test_hermite_physicists_matches_scipy():
    _check(_stacked(poly.hermite_basis_list(jnp.asarray(T), DEG)),
           lambda n: scipy_special.eval_hermite(n, T))


@pytest.mark.parametrize("alpha", [0.0, 0.5])
def test_generalized_laguerre_matches_scipy(alpha):
    _check(_stacked(poly.laguerre_basis_list(jnp.asarray(T), DEG, alpha)),
           lambda n: scipy_special.eval_genlaguerre(n, alpha, T))


def test_chebyshev_trig_and_recurrence_match_scipy():
    """Both Chebyshev forms (trig identity, used by the layers; plain
    recurrence, used inside Pallas kernels where acos has no lowering)
    equal T_n.  Feed x = artanh(t) so the layer-internal tanh lands on t."""
    x = jnp.asarray(np.arctanh(T))
    _check(poly.chebyshev_basis(x, DEG),
           lambda n: scipy_special.eval_chebyt(n, T))
    _check(_stacked(poly.chebyshev_basis_recurrence_list(x, DEG)),
           lambda n: scipy_special.eval_chebyt(n, T))


def test_bessel_polynomials_closed_form():
    """y_n(x) = sum_k (n+k)!/((n-k)! k!) (x/2)^k."""
    def y(n, x):
        return sum(factorial(n + k) / (factorial(n - k) * factorial(k))
                   * (x / 2.0) ** k for k in range(n + 1))
    _check(_stacked(poly.bessel_basis_list(jnp.asarray(T), DEG)),
           lambda n: y(n, T))


def test_fibonacci_polynomials_closed_form():
    """F_n(x) = sum_k C(n-k-1, k) x^(n-2k-1), F_0 = 0."""
    def f(n, x):
        if n == 0:
            return np.zeros_like(x)
        return sum(comb(n - k - 1, k) * x ** (n - 2 * k - 1)
                   for k in range((n + 1) // 2))
    _check(_stacked(poly.fibonacci_basis_list(jnp.asarray(T), DEG)),
           lambda n: f(n, T))


def test_lucas_polynomials_closed_form():
    """L_n(x) = sum_k n/(n-k) C(n-k, k) x^(n-2k), L_0 = 2."""
    def l(n, x):
        if n == 0:
            return 2.0 * np.ones_like(x)
        return sum(n / (n - k) * comb(n - k, k) * x ** (n - 2 * k)
                   for k in range(n // 2 + 1))
    _check(_stacked(poly.lucas_basis_list(jnp.asarray(T), DEG)),
           lambda n: l(n, T))


def test_taylor_is_monomials():
    got = np.asarray(poly.taylor_basis(jnp.asarray(T), DEG))
    _check(got, lambda n: T ** n)


def test_bernstein_reference_bug_pinned():
    """The reference's 'Bersnstein' de Casteljau runs from an ALL-ONES
    buffer, which evaluates the constant-1 polynomial: every basis column
    is identically 1 regardless of x (layers/bersnstein_kan_layers.py:
    120-139; the reference's own layers/README.md flags the family as
    'not learning').  We replicate the computation exactly — this test
    pins the quirk so an accidental 'fix' that breaks torch parity (and
    the committed goldens) is caught with an explanation."""
    u = jnp.asarray((T + 1) / 2)  # sigmoid-squashed domain
    got = np.asarray(poly.bernstein_basis(u, DEG))
    np.testing.assert_array_equal(got, np.ones_like(got))
    # and the TRUE Bernstein basis B_{i,n}(u) is nothing like all-ones
    true_b = np.stack([comb(DEG, i) * ((T + 1) / 2) ** i
                       * (1 - (T + 1) / 2) ** (DEG - i)
                       for i in range(DEG + 1)], -1)
    assert np.abs(true_b - got).max() > 0.5


def test_bspline_matches_scipy_interpolate():
    """Cox–de Boor basis vs scipy.interpolate.BSpline basis elements on
    the same extended uniform knot vector (interior points only — the
    half-open degree-0 indicator differs from scipy's closed last
    interval exactly at the final knot, a documented reference quirk)."""
    from scipy.interpolate import BSpline

    grid_size, order = 5, 3
    knots = np.asarray(bspline.make_bspline_grid(grid_size, order),
                       np.float64)
    x = np.linspace(-0.99, 0.99, 17)
    got = np.asarray(bspline.bspline_basis(jnp.asarray(x), knots, order))
    assert got.shape == (17, grid_size + order)
    for i in range(grid_size + order):
        c = np.zeros(grid_size + order)
        c[i] = 1.0
        want = BSpline(knots, c, order, extrapolate=False)(x)
        np.testing.assert_allclose(got[:, i], np.nan_to_num(want),
                                   atol=1e-9)
    # partition of unity on the core interval
    np.testing.assert_allclose(got.sum(-1), np.ones(17), atol=1e-9)
