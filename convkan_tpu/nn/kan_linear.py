"""KAN MLP (dense) layers — the 17 per-family "Layer" classes.

These mirror the reference's MLP variants (models/kans.py imports them from
layers/*.py).  Linear weights are stored (in, out) (row-vector convention);
einsum coefficient tensors keep the reference's (in, out, K) layout so
checkpoints map 1:1.

Reference citations per class are in each docstring.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..basis import (
    bernstein_basis,
    bessel_basis,
    bspline_basis,
    chebyshev_basis,
    fibonacci_basis,
    fourier_basis,
    gegenbauer_basis,
    gram_basis,
    hermite_basis,
    jacobi_basis,
    laguerre_basis,
    legendre_basis,
    lucas_basis,
    wavelet,
)
from ..basis.bspline import make_bspline_grid
from ..basis.relukan import default_phases, relukan_basis
from ..basis.rbf import make_rbf_grid, rbf_basis, rbf_cols
from ..utils import activations as act_lib
from ..utils import initializers as init_lib
from ..utils.norms import BatchNorm, LayerNorm


def _resolve(act, default):
    if act == "__default__":
        return act_lib.ACTIVATIONS[default]
    fn = act_lib.resolve_activation(act)
    return fn if fn is not None else (lambda x: x)


class KANLinear(nn.Module):
    """B-spline KAN dense layer (layers/kan_layers.py:8-114).

    base = GELU(x) @ W_base; spline = flat_bases @ W_spline;
    out = PReLU(LayerNorm(base + spline)).

    `p_deactivate` > 0 enables Segment Deactivation during training — the
    working equivalent of the reference's (dead) SegmentDeactivation
    wrapper (utils/regularization.py:205-308): each (out, in) spline edge
    is independently replaced, with probability p, by the linear chord
    through the spline's values at the grid endpoints
    (grid[order], grid[-order-1]).  Uses the 'dropout' rng stream.
    """

    input_dim: int
    output_dim: int
    grid_size: int = 5
    spline_order: int = 3
    base_activation: Any = "__default__"
    grid_range: Tuple[float, float] = (-1.0, 1.0)
    grid_override: Any = None
    p_deactivate: float = 0.0
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _resolve(self.base_activation, "gelu")
        K = self.grid_size + self.spline_order
        base_w = self.param(
            "base_w", init_lib.kaiming_uniform("linear", layout="linear_io"),
            (self.input_dim, self.output_dim), self.param_dtype)
        # torch shape (out, in, K): fan_in = in * K
        bound = math.sqrt(3.0 / (self.input_dim * K))
        spline_w = self.param(
            "spline_w", init_lib.uniform(-bound, bound),
            (self.input_dim * K, self.output_dim), self.param_dtype)

        if self.grid_override is not None:
            grid = jnp.asarray(self.grid_override)
        else:
            grid = make_bspline_grid(self.grid_size, self.spline_order,
                                     self.grid_range)
        if train and self.p_deactivate > 0:
            bases = bspline_basis(x, grid, self.spline_order)  # (B, in, K)
            y = act(x) @ base_w + self._segment_deactivated_spline(
                x, bases, grid, spline_w)
        else:
            # degree-major fast path: the channel-major flatten of the
            # stacked (B, in, K) basis is a lane-interleave relayout (same
            # fix as KanConvND); concat the K list columns instead and
            # permute the (tiny) weight rows, folding the base path into
            # the same matmul.
            cols = self._bspline_cols(x, grid)
            if cols is not None:
                K_ = len(cols)
                w_dm = spline_w.reshape(self.input_dim, K_, self.output_dim)
                w_dm = jnp.swapaxes(w_dm, 0, 1).reshape(-1, self.output_dim)
                lhs = jnp.concatenate(cols + [act(x)], axis=-1)
                w_all = jnp.concatenate([w_dm, base_w], axis=0)
                y = lhs @ w_all
            else:
                bases = bspline_basis(x, grid, self.spline_order)
                y = act(x) @ base_w + bases.reshape(x.shape[0], -1) @ spline_w
        y = LayerNorm(num_features=self.output_dim)(y)
        alpha = self.param("prelu", init_lib.constant(0.25), (), self.param_dtype)
        return jnp.where(y >= 0, y, alpha * y)

    def _bspline_cols(self, x, grid):
        """List form of the basis when the knot vector is static (always,
        outside exotic tracing); None otherwise."""
        import numpy as _np

        from ..basis.bspline import bspline_basis_unrolled_list
        try:
            knots = tuple(float(v) for v in _np.asarray(grid))
        except Exception:
            return None
        return bspline_basis_unrolled_list(x, knots, self.spline_order)

    def _segment_deactivated_spline(self, x, bases, grid, spline_w):
        """Spline output with per-edge Segment Deactivation
        (utils/regularization.py:253-305, vectorized): masked (out, in)
        edges contribute the linear chord a*x+b through the spline's
        values at the grid endpoints instead of the spline itself."""
        from ..utils.regularization import segment_deactivation_mask

        w = spline_w.reshape(self.input_dim, -1, self.output_dim)
        contrib = jnp.einsum("bik,iko->bio", bases, w)      # (B, in, out)
        grid = jnp.asarray(grid)
        xs = grid[self.spline_order]
        xe = grid[-self.spline_order - 1]
        ends = jnp.broadcast_to(
            jnp.stack([xs, xe]).astype(x.dtype)[:, None],
            (2, self.input_dim))
        eb = bspline_basis(ends, grid, self.spline_order)   # (2, in, K)
        y_ends = jnp.einsum("eik,iko->eio", eb, w)
        dx = xe - xs
        a = jnp.where(jnp.abs(dx) < 1e-8, 0.0,
                      (y_ends[1] - y_ends[0]) / dx)         # (in, out)
        b = y_ends[0] - a * xs
        linear = a[None] * x[..., None] + b[None]           # (B, in, out)
        mask = segment_deactivation_mask(
            self.make_rng("dropout"), self.output_dim, self.input_dim,
            self.p_deactivate)                              # (out, in)
        sel = jnp.where(mask.T[None], linear, contrib)
        return jnp.sum(sel, axis=1)


class FastKANLinear(nn.Module):
    """RBF FastKAN dense layer (layers/fast_kan_layers.py:5-33 +
    utils/utils.py:6-33)."""

    input_dim: int
    output_dim: int
    grid_min: float = -2.0
    grid_max: float = 2.0
    num_grids: int = 8
    use_base_update: bool = True
    base_activation: Any = "__default__"
    spline_weight_init_scale: float = 0.1
    grid_override: Any = None
    param_dtype: Any = jnp.float32
    # opt-in bf16 compute island on the SPLINE path (round 4 — the MLP
    # analogue of KanConvND.island_bf16): cast the normalized input +
    # grid + spline weights to bf16, so the wide (B, in*G) RBF basis and
    # its autodiff cotangent move half the bytes and the contraction runs
    # on the bf16 MXU path; result cast back to f32 before the base-path
    # add.  NOT torch-bit-exact.  None = the process default shared with
    # the convs (nn.kan_conv.set_perf_defaults(island_bf16=...)).
    island_bf16: Any = None

    @property
    def _island_bf16_on(self) -> bool:
        from .kan_conv import _PERF_DEFAULTS

        return (_PERF_DEFAULTS["island_bf16"] if self.island_bf16 is None
                else self.island_bf16)

    @nn.compact
    def __call__(self, x, train: bool = True, time_benchmark: bool = False):
        act = _resolve(self.base_activation, "silu")
        # time_benchmark skips the input layernorm
        # (fast_kan_layers.py:24-28 parity)
        xn = x if time_benchmark else LayerNorm(
            num_features=self.input_dim)(x)
        if self.grid_override is not None:
            grid = jnp.asarray(self.grid_override)
        else:
            grid = make_rbf_grid(self.grid_min, self.grid_max, self.num_grids)
        denom = (self.grid_max - self.grid_min) / (self.num_grids - 1)
        spline_w = self.param(
            "spline_w",
            init_lib.trunc_normal(0.0, self.spline_weight_init_scale),
            (self.input_dim * self.num_grids, self.output_dim), self.param_dtype)
        xs, ws = xn, spline_w
        island = self._island_bf16_on and xn.dtype == jnp.float32
        if island:
            xs = xn.astype(jnp.bfloat16)
            grid = grid.astype(jnp.bfloat16)
            ws = spline_w.astype(jnp.bfloat16)
        cols = rbf_cols(xs, grid, denom)
        if cols is not None:
            # degree-major fast path: lane-concat RBF columns + permuted
            # weight rows (avoids the (B, in, G) -> (B, in*G) interleave)
            w_dm = ws.reshape(self.input_dim, len(cols),
                              self.output_dim)
            w_dm = jnp.swapaxes(w_dm, 0, 1).reshape(-1, self.output_dim)
            ret = jnp.concatenate(cols, axis=-1) @ w_dm
        else:
            basis = rbf_basis(xs, grid, denom)  # (B, in, G)
            ret = basis.reshape(x.shape[0], -1) @ ws
        if island:
            ret = ret.astype(jnp.float32)
        if self.use_base_update:
            # torch nn.Linear default init (kaiming_uniform a=sqrt(5) + bias)
            base_w = self.param(
                "base_w",
                init_lib.kaiming_uniform("leaky_relu", a=math.sqrt(5.0),
                                         layout="linear_io"),
                (self.input_dim, self.output_dim), self.param_dtype)
            base_b = self.param(
                "base_b", init_lib.torch_linear_bias(self.input_dim),
                (self.output_dim,), self.param_dtype)
            ret = ret + act(x) @ base_w + base_b
        return ret


class ChebyKANLinear(nn.Module):
    """Chebyshev dense layer (layers/cheby_kan_layers.py:5-38): einsum only,
    no base path, no norm."""

    input_dim: int
    output_dim: int
    degree: int = 3
    epsilon: float = 1e-7
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        coeffs = self.param(
            "coeffs",
            init_lib.normal(0.0, 1.0 / (self.input_dim * (self.degree + 1))),
            (self.input_dim, self.output_dim, self.degree + 1), self.param_dtype)
        x = x.reshape(-1, self.input_dim)
        basis = chebyshev_basis(x, self.degree, self.epsilon)  # (B, in, d+1)
        return jnp.einsum("bid,iod->bo", basis, coeffs)


class LegendreKANLinear(nn.Module):
    """Legendre dense layer (layers/legendre_kan_layers.py:8-51): batch
    min-max squash, base+poly, act(LayerNorm(.))."""

    input_dim: int
    output_dim: int
    degree: int = 3
    base_activation: Any = "__default__"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _resolve(self.base_activation, "silu")
        base_w = self.param(
            "base_w", init_lib.kaiming_uniform("linear", layout="linear_io"),
            (self.input_dim, self.output_dim), self.param_dtype)
        # torch shape (out, in*(d+1)): fan_in = in*(d+1)
        bound = math.sqrt(3.0 / (self.input_dim * (self.degree + 1)))
        poly_w = self.param(
            "poly_w", init_lib.uniform(-bound, bound),
            (self.input_dim * (self.degree + 1), self.output_dim),
            self.param_dtype)
        base = act(x) @ base_w
        xn = 2.0 * (x - jnp.min(x)) / (jnp.max(x) - jnp.min(x)) - 1.0
        basis = legendre_basis(xn, self.degree)  # (B, in, d+1) channel-major
        poly = basis.reshape(x.shape[0], -1) @ poly_w
        y = LayerNorm(num_features=self.output_dim)(base + poly)
        return act(y)


class GRAMKANLinear(nn.Module):
    """Gram dense layer (layers/gram_kan_layers.py:9-84)."""

    input_dim: int
    output_dim: int
    degree: int = 3
    base_activation: Any = "__default__"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _resolve(self.base_activation, "silu")
        base_w = self.param(
            "base_w", init_lib.xavier_uniform(layout="linear_io"),
            (self.input_dim, self.output_dim), self.param_dtype)
        # torch shape (in, out, d+1): fan_in = out*(d+1), fan_out = in*(d+1)
        fan_in = self.output_dim * (self.degree + 1)
        fan_out = self.input_dim * (self.degree + 1)
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        coeffs = self.param(
            "coeffs", init_lib.uniform(-bound, bound),
            (self.input_dim, self.output_dim, self.degree + 1), self.param_dtype)
        beta = self.param(
            "beta_weights",
            init_lib.normal(0.0, 1.0 / (self.input_dim * (self.degree + 1.0))),
            (self.degree + 1,), self.param_dtype)
        base = act(x) @ base_w
        t = jnp.tanh(x)
        gb = act(gram_basis(t, self.degree, beta))
        y = jnp.einsum("bld,lod->bo", gb, coeffs)
        y = LayerNorm(num_features=self.output_dim)(y + base)
        return act(y)


class JacobiKANLinear(nn.Module):
    """Jacobi dense layer (layers/jacobi_kan_layers.py:10-56)."""

    input_dim: int
    output_dim: int
    degree: int = 3
    a: float = 1.0
    b: float = 1.0
    base_activation: Any = "__default__"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _resolve(self.base_activation, "gelu")
        base_w = self.param(
            "base_w", init_lib.xavier_uniform(layout="linear_io"),
            (self.input_dim, self.output_dim), self.param_dtype)
        coeffs = self.param(
            "coeffs",
            init_lib.normal(0.0, 1.0 / (self.input_dim * (self.degree + 1))),
            (self.input_dim, self.output_dim, self.degree + 1), self.param_dtype)
        x = x.reshape(-1, self.input_dim)
        base = act(x) @ base_w
        basis = jacobi_basis(jnp.tanh(x), self.degree, self.a, self.b)
        y = jnp.einsum("bid,iod->bo", basis, coeffs)
        y = LayerNorm(num_features=self.output_dim)(y + base)
        return act(y)


class BersnsteinKANLinear(nn.Module):
    """Bernstein dense layer (layers/bersnstein_kan_layers.py:8-62)."""

    input_dim: int
    output_dim: int
    degree: int = 3
    base_activation: Any = "__default__"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _resolve(self.base_activation, "silu")
        base_w = self.param(
            "base_w", init_lib.xavier_uniform(layout="linear_io"),
            (self.input_dim, self.output_dim), self.param_dtype)
        coeffs = self.param(
            "coeffs",
            init_lib.normal(0.0, 1.0 / (self.input_dim * (self.degree + 1))),
            (self.input_dim, self.output_dim, self.degree + 1), self.param_dtype)
        x = x.reshape(-1, self.input_dim)
        base = act(x) @ base_w
        basis = bernstein_basis(jax.nn.sigmoid(x), self.degree)
        y = jnp.einsum("bid,iod->bo", basis, coeffs)
        y = LayerNorm(num_features=self.output_dim)(y + base)
        return act(y)


class _EinsumOnlyKanLinear(nn.Module):
    """Shared skeleton for the einsum-only dense families: tanh squash ->
    recurrence basis -> einsum('bid,iod->bo').  Covers Bessel (:8-37),
    Fibonacci (:8-39), Gegenbauer (:7-33), Hermite (:7-29), Laguerre
    (:7-37), Lucas (:8-39) — all with coeff init N(0, 1/(in*(d+1)))."""

    input_dim: int
    output_dim: int
    degree: int = 3
    family: str = ""
    alpha: float = 0.0
    param_dtype: Any = jnp.float32

    def _basis(self, t):
        f = self.family
        if f == "bessel":
            return bessel_basis(t, self.degree)
        if f == "fibonacci":
            return fibonacci_basis(t, self.degree)
        if f == "gegenbauer":
            return gegenbauer_basis(t, self.degree, self.alpha)
        if f == "hermite":
            return hermite_basis(t, self.degree)
        if f == "laguerre":
            return laguerre_basis(t, self.degree, self.alpha)
        if f == "lucas":
            return lucas_basis(t, self.degree)
        raise ValueError(f)

    @nn.compact
    def __call__(self, x, train: bool = True):
        coeffs = self.param(
            "coeffs",
            init_lib.normal(0.0, 1.0 / (self.input_dim * (self.degree + 1))),
            (self.input_dim, self.output_dim, self.degree + 1), self.param_dtype)
        x = x.reshape(-1, self.input_dim)
        basis = self._basis(jnp.tanh(x))
        return jnp.einsum("bid,iod->bo", basis, coeffs)


def BesselKANLinear(input_dim, output_dim, degree=3, **kw):
    return _EinsumOnlyKanLinear(input_dim=input_dim, output_dim=output_dim,
                                degree=degree, family="bessel", **kw)


def FibonacciKANLinear(input_dim, output_dim, degree=3, **kw):
    return _EinsumOnlyKanLinear(input_dim=input_dim, output_dim=output_dim,
                                degree=degree, family="fibonacci", **kw)


def GegenbauerKANLinear(input_dim, output_dim, degree=3, alpha_param=0.0, **kw):
    return _EinsumOnlyKanLinear(input_dim=input_dim, output_dim=output_dim,
                                degree=degree, family="gegenbauer",
                                alpha=alpha_param, **kw)


def HermiteKANLinear(input_dim, output_dim, degree=3, **kw):
    return _EinsumOnlyKanLinear(input_dim=input_dim, output_dim=output_dim,
                                degree=degree, family="hermite", **kw)


def LaguerreKANLinear(input_dim, output_dim, degree=3, alpha=0.0, **kw):
    return _EinsumOnlyKanLinear(input_dim=input_dim, output_dim=output_dim,
                                degree=degree, family="laguerre", alpha=alpha,
                                **kw)


def LucasKANLinear(input_dim, output_dim, degree=3, **kw):
    return _EinsumOnlyKanLinear(input_dim=input_dim, output_dim=output_dim,
                                degree=degree, family="lucas", **kw)


class FourierKANLinear(nn.Module):
    """Fourier dense layer (layers/fourier_kan_layers.py:7-66)."""

    input_dim: int
    output_dim: int
    grid_size: int = 3
    add_bias: bool = True
    smooth_initialization: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        G = self.grid_size

        def coeff_init(key, shape, dtype=jnp.float32):
            w = jax.random.normal(key, shape, dtype)
            if self.smooth_initialization:
                norm = (jnp.arange(G, dtype=dtype) + 1.0) ** 2
            else:
                norm = jnp.asarray(math.sqrt(G), dtype)
            return w / (math.sqrt(self.input_dim) * norm)

        # (2, out, in, G) — reference layout
        coeffs = self.param("coeffs", coeff_init,
                            (2, self.output_dim, self.input_dim, G),
                            self.param_dtype)
        shape_in = x.shape
        x = x.reshape(-1, self.input_dim)
        k = jnp.arange(1, G + 1, dtype=x.dtype)
        kx = x[:, None, :, None] * k  # (B, 1, in, G)
        y = jnp.sum(jnp.cos(kx) * coeffs[0:1], axis=(-2, -1))
        y = y + jnp.sum(jnp.sin(kx) * coeffs[1:2], axis=(-2, -1))
        if self.add_bias:
            bias = self.param("bias", init_lib.zeros, (1, self.output_dim),
                              self.param_dtype)
            y = y + bias
        return y.reshape(shape_in[:-1] + (self.output_dim,))


class TaylorKANLinear(nn.Module):
    """Taylor dense layer (layers/taylor_kan_layers.py:7-38): monomials of
    the RAW input (no tanh), coeffs (out,in,degree)*0.01."""

    input_dim: int
    output_dim: int
    degree: int = 3
    add_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        coeffs = self.param(
            "coeffs", init_lib.normal(0.0, 0.01),
            (self.output_dim, self.input_dim, self.degree), self.param_dtype)
        shape_in = x.shape
        x = x.reshape(-1, self.input_dim)
        y = jnp.zeros((x.shape[0], self.output_dim), x.dtype)
        xp = jnp.ones_like(x)
        for i in range(self.degree):
            if i > 0:
                xp = xp * x
            y = y + xp @ coeffs[:, :, i].T
        if self.add_bias:
            bias = self.param("bias", init_lib.zeros, (1, self.output_dim),
                              self.param_dtype)
            y = y + bias
        return y.reshape(shape_in[:-1] + (self.output_dim,))


class ReLUKANLinear(nn.Module):
    """ReLU-KAN dense layer (layers/relu_kan_layers.py:9-40).

    The reference feeds the (B, in, g+k) windowed basis through a full-size
    Conv2d(1, out, (g+k, in)) after a memory-reinterpreting reshape — which
    is exactly a linear map over the row-major flattened basis; we implement
    it as such.
    """

    input_dim: int
    output_dim: int
    g: int = 5
    k: int = 3
    train_ab: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        gk = self.g + self.k
        low0, high0 = default_phases(self.g, self.k)

        def make_phase(v):
            def init(key, shape, dtype=jnp.float32):
                return jnp.broadcast_to(jnp.asarray(v), shape).astype(dtype)
            return init

        shape = (self.input_dim, gk)
        if self.train_ab:
            phase_low = self.param("phase_low", make_phase(low0), shape,
                                   self.param_dtype)
            phase_high = self.param("phase_high", make_phase(high0), shape,
                                    self.param_dtype)
        else:
            phase_low = jnp.broadcast_to(jnp.asarray(low0), shape)
            phase_high = jnp.broadcast_to(jnp.asarray(high0), shape)

        basis = relukan_basis(x, phase_low, phase_high, self.g, self.k)
        flat = basis.reshape(x.shape[0], self.input_dim * gk)
        # torch Conv2d(1, out, (g+k, in)) default init: kaiming_uniform
        # a=sqrt(5) with fan_in = (g+k)*in, bias U(+-1/sqrt(fan_in))
        fan_in = gk * self.input_dim
        # kaiming_uniform(a=sqrt(5)) bound works out to exactly 1/sqrt(fan_in)
        bound_w = 1.0 / math.sqrt(fan_in)
        w = self.param("conv_w", init_lib.uniform(-bound_w, bound_w),
                       (self.input_dim * gk, self.output_dim), self.param_dtype)
        b = self.param("conv_b", init_lib.uniform(-bound_w, bound_w),
                       (self.output_dim,), self.param_dtype)
        return flat @ w + b


class WavKANLinear(nn.Module):
    """Wavelet dense layer (layers/wav_kan_layers.py:18-111): per-(out,in)
    scale/translation, weighted wavelet sum + SiLU base path, BatchNorm1d."""

    input_dim: int
    output_dim: int
    wavelet_type: str = "mexican_hat"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        scale = self.param("scale", init_lib.ones,
                           (self.output_dim, self.input_dim), self.param_dtype)
        translation = self.param("translation", init_lib.zeros,
                                 (self.output_dim, self.input_dim),
                                 self.param_dtype)
        # kaiming_uniform(a=sqrt(5)) on (out, in): bound = 1/sqrt(in)
        ku = init_lib.kaiming_uniform("leaky_relu", a=math.sqrt(5.0),
                                      layout="torch")
        wavelet_w = self.param("wavelet_w", ku,
                               (self.output_dim, self.input_dim),
                               self.param_dtype)
        base_w = self.param("base_w", ku, (self.output_dim, self.input_dim),
                            self.param_dtype)
        x2 = x.reshape(-1, self.input_dim)
        xs = (x2[:, None, :] - translation) / scale  # (B, out, in)
        psi = wavelet(xs, self.wavelet_type, channel_axis=2)
        wav_out = jnp.sum(psi * wavelet_w, axis=2)
        base_out = jax.nn.silu(x2) @ base_w.T
        y = wav_out + base_out
        return BatchNorm(num_features=self.output_dim)(y, train=train)
