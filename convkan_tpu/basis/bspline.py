"""Cox–de Boor B-spline basis (the classic Liu-et-al KAN basis).

Reproduces the reference recurrence (layers/kan_layers.py:203-237 for convs,
:57-103 for the MLP layer): a degree-0 half-open-interval indicator followed
by `spline_order` rational blending steps over a uniform extended grid of
`grid_size + 2*spline_order + 1` knots spanning
[lo - h*order, hi + h*order], h = (hi - lo)/grid_size.

The recurrence after `spline_order` steps yields
`grid_size + spline_order` basis functions — the reference's defensive
pad/truncate (kan_layers.py:96-103) is unreachable for a uniform grid and is
not replicated.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_bspline_grid(grid_size: int, spline_order: int, grid_range=(-1.0, 1.0)):
    """The extended uniform knot vector as a static numpy array."""
    lo, hi = float(grid_range[0]), float(grid_range[1])
    h = (hi - lo) / grid_size
    n = grid_size + 2 * spline_order + 1
    return np.linspace(lo - h * spline_order, hi + h * spline_order, n, dtype=np.float32)


def bspline_basis(x, grid, spline_order: int):
    """x: any shape; grid: (n_knots,) knot vector.

    Returns (..., grid_size + spline_order) basis values.  Degree-0 bases use
    the half-open indicator (x >= g_i) & (x < g_{i+1}) exactly as
    kan_layers.py:209, so inputs outside the extended grid produce all-zero
    spline contributions (a documented reference quirk).
    """
    # Fast path for static knot vectors (the only case the layers hit):
    # unroll the knots into python scalars.  The broadcast-over-knots form
    # below materializes ~2*order*(n_knots) rank-5 intermediates that XLA
    # declines to fuse — measured 14.3 ms vs 1.5 ms (9.2x, bit-identical)
    # for (1024,32,32,16) on v5e.
    try:
        knots = tuple(float(v) for v in np.asarray(grid))
    except Exception:
        knots = None
    if knots is not None:
        return jnp.stack(
            bspline_basis_unrolled_list(x, knots, spline_order), axis=-1)

    # the reference stores the knot vector in f32 and performs knot-knot
    # arithmetic at f32 regardless of the activation dtype (the grid is a
    # plain f32 tensor attr, kan_layers.py:184-190) — mirror that so f64
    # parity tests bit-match
    grid32 = jnp.asarray(grid, dtype=jnp.float32)
    grid = grid32.astype(x.dtype)
    xe = x[..., None]
    bases = ((xe >= grid[:-1]) & (xe < grid[1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = grid[: -(k + 1)]
        g_rs = grid[k + 1 :]
        dr = (grid32[k:-1] - grid32[: -(k + 1)]).astype(x.dtype)
        dd = (grid32[k + 1 :] - grid32[1:-k]).astype(x.dtype)
        dr = jnp.where(dr == 0, jnp.ones_like(dr), dr)
        dd = jnp.where(dd == 0, jnp.ones_like(dd), dd)
        t1 = (xe - left) / dr * bases[..., :-1]
        t2 = (g_rs - xe) / dd * bases[..., 1:]
        bases = t1 + t2
    return bases


def bspline_basis_unrolled_list(x, knots, spline_order: int):
    """Cox–de Boor with the knot vector unrolled into python scalars.

    Numerically identical recurrence to `bspline_basis` (knot deltas are
    pre-rounded at f32 like the reference's f32 grid arithmetic), but with
    no captured constant arrays — required for use inside Pallas kernels,
    and friendlier to the VPU (no broadcasts over a knot axis).
    """
    g32 = np.asarray(knots, np.float32)
    kn = [float(v) for v in g32]
    n = len(kn)
    bases = [((x >= kn[i]) & (x < kn[i + 1])).astype(x.dtype)
             for i in range(n - 1)]
    for k in range(1, spline_order + 1):
        new = []
        for i in range(len(bases) - 1):
            dr = float(g32[i + k] - g32[i]) or 1.0
            dd = float(g32[i + k + 1] - g32[i + 1]) or 1.0
            # (multiply-by-reciprocal instead of the divide was measured
            # a wash on the headline step — 49.46k vs 49.50k img/s — so
            # the exact-parity divide stays; see BENCH_NOTES.md)
            t1 = (x - kn[i]) / dr * bases[i]
            t2 = (kn[i + k + 1] - x) / dd * bases[i + 1]
            new.append(t1 + t2)
        bases = new
    return bases


def bspline_basis_unrolled(x, knots, spline_order: int):
    return jnp.stack(bspline_basis_unrolled_list(x, knots, spline_order),
                     axis=-1)


def bspline_basis_cardinal_flat(x, knots, spline_order: int):
    """Single-operand degree-major basis: (..., C) -> (..., K*C).

    For a UNIFORM knot vector every Cox-de Boor column is the same
    cardinal bump shifted: B_i(x) = B((x - t_i)/h) with B evaluated over
    integer knots 0..order+1.  Expressing the whole buffer as ONE
    elementwise function of a broadcast x (per-lane constant shifts)
    gives XLA a single fusible producer, where the K-column concat of
    `bspline_basis_unrolled_list` lowers to a K-ary dynamic-update-slice
    chain that re-reads x per column (measured on the KAN-VGG16_small
    train step — see BENCH_NOTES.md).

    Matches the recurrence to f32 roundoff (~1e-7 rel), NOT bit-exactly:
    the rational weights are computed on u=(x-t_i)/h instead of x.
    Requires a uniform grid; callers fall back to the list form otherwise.
    """
    g32 = np.asarray(knots, np.float32)
    deltas = np.diff(g32)
    if not np.allclose(deltas, deltas[0], rtol=1e-5, atol=0):
        return None
    h = float(deltas[0])
    K = len(g32) - spline_order - 1   # grid_size + spline_order columns
    C = x.shape[-1]
    shifts = np.repeat(g32[:K], C)    # lane k*C + c  <-  t_k
    xb = jnp.broadcast_to(x[..., None, :], x.shape[:-1] + (K, C))
    xb = xb.reshape(x.shape[:-1] + (K * C,))
    u = (xb - jnp.asarray(shifts, x.dtype)) / jnp.asarray(
        np.float32(h), x.dtype)
    # cardinal B_order(u): the same unrolled recurrence over integer knots
    cols = bspline_basis_unrolled_list(
        u, tuple(float(i) for i in range(spline_order + 2)), spline_order)
    assert len(cols) == 1
    return cols[0]
