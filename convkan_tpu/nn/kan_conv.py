"""Generic KAN convolution for TPU.

One module implements all 16 non-wavelet conv families (WavKAN lives in
wav_conv.py).  The reference implements each family as a copy-pasted class
with a Python loop over per-group conv modules (e.g. layers/kan_layers.py:
116-258); here the shared skeleton —

    split groups -> base conv path -> basis expansion -> basis conv path
    -> add -> norm -> activation -> dropout

— is a single code path parameterized by a declarative `ConvFamily` spec,
and groups execute as ONE grouped XLA conv (feature_group_count) instead of
a loop.  Activations are channel-last (NHWC / NDHWC); weights are HWIO with
the group axis folded into O.

Per-family deviations of the reference (no base path for ChebyKAN, input
normalization for FastKAN, batch-min-max squash for LegendreKAN, degree- vs
channel-major basis layout, dropout placement, init distributions) are
encoded in FAMILY specs below, each citing the reference lines it matches.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Mapping, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

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
    relukan_basis,
    taylor_basis,
)
from ..basis.bspline import make_bspline_grid
from ..basis.relukan import default_phases
from ..basis.rbf import make_rbf_grid, rbf_basis, rbf_cols
from ..ops.conv import conv_nd
from ..parallel.halo import (  # noqa: F401  (set_spatial_defaults re-export)
    maybe_sharded_conv, resolve_spatial, set_spatial_defaults,
)
from ..utils import activations as act_lib
from ..utils import initializers as init_lib
from ..utils.norms import InstanceNorm, make_norm


@dataclasses.dataclass(frozen=True)
class ConvFamily:
    """Static description of one KAN conv family's deviations from the
    shared skeleton."""

    name: str
    has_base: bool = True
    base_input: str = "act"        # 'act' (conv(act(x))) or 'raw' (conv(x))
    squash: str = "tanh"           # 'none'|'tanh'|'sigmoid'|'batch_minmax'|'intrinsic'
    layout: str = "channel_major"  # basis channel ordering within a group
    post: str = "prelu"            # 'prelu'|'act'|'none' applied after norm
    norm_on: str = "output"        # 'output' | 'input' (FastKAN) | 'none'
    dropout_site: str = "output"   # 'output'|'basis_input'|'basis'|'input'|'rbf_input'
    basis_act: bool = False        # GRAM: basis = act(basis) before conv
    poly_init: str = "ku_linear"   # 'ku_linear'|'ku_5d'|'normal_full'|'kn_relu'
    default_base_activation: str = "gelu"


# Reference citations:
#   KAN        layers/kan_layers.py:116-258
#   FastKAN    layers/fast_kan_layers.py:34-120
#   ChebyKAN   layers/cheby_kan_layers.py:39-111
#   Legendre   layers/legendre_kan_layers.py:52-163
#   GRAM       layers/gram_kan_layers.py:85-199
#   Jacobi     layers/jacobi_kan_layers.py:57-177
#   Bernstein  layers/bersnstein_kan_layers.py:63-179
#   Bessel     layers/bessel_kan_layers.py:38-172
#   Fibonacci  layers/fibonacci_kan_layers.py:41-203
#   Fourier    layers/fourier_kan_layers.py:67-212
#   Gegenbauer layers/gegenbauer_kan_layers.py:34-183
#   Hermite    layers/hermite_kan_layers.py:30-164
#   Laguerre   layers/laguerre_kan_layers.py:38-184
#   Lucas      layers/lucas_kan_layers.py:40-203
#   Taylor     layers/taylor_kan_layers.py:40-176
#   ReLUKAN    layers/relu_kan_layers.py:41-146
FAMILIES: dict[str, ConvFamily] = {
    "kan": ConvFamily("kan", squash="intrinsic", post="prelu",
                      default_base_activation="gelu"),
    "fastkan": ConvFamily("fastkan", squash="intrinsic", post="none",
                          norm_on="input", dropout_site="rbf_input",
                          default_base_activation="silu"),
    "cheby": ConvFamily("cheby", has_base=False, squash="intrinsic",
                        post="none", poly_init="kn_relu"),
    "legendre": ConvFamily("legendre", base_input="raw", squash="batch_minmax",
                           layout="degree_major", post="act",
                           dropout_site="basis_input", poly_init="ku_5d",
                           default_base_activation="silu"),
    "gram": ConvFamily("gram", base_input="act", squash="tanh",
                       layout="degree_major", post="act",
                       dropout_site="basis_input", basis_act=True,
                       poly_init="ku_5d", default_base_activation="silu"),
    # jacobi: the 1/2/3-D subclasses default base_activation to GELU
    # (jacobi_kan_layers.py:192) even though the ND base defaults to SiLU
    "jacobi": ConvFamily("jacobi", base_input="raw", squash="tanh",
                         layout="degree_major", post="act",
                         dropout_site="basis", poly_init="normal_full",
                         default_base_activation="gelu"),
    "bernstein": ConvFamily("bernstein", base_input="raw", squash="sigmoid",
                            layout="channel_major", post="act",
                            dropout_site="basis_input", poly_init="ku_5d",
                            default_base_activation="silu"),
    "bessel": ConvFamily("bessel", post="prelu"),
    "fibonacci": ConvFamily("fibonacci", post="prelu"),
    "fourier": ConvFamily("fourier", squash="intrinsic", post="prelu"),
    "gegenbauer": ConvFamily("gegenbauer", post="prelu"),
    "hermite": ConvFamily("hermite", post="prelu"),
    "laguerre": ConvFamily("laguerre", post="prelu"),
    "lucas": ConvFamily("lucas", post="prelu"),
    # taylor: tanh happens inside the basis (slot 0 stays raw ones) — mark
    # intrinsic so the shared squash isn't applied twice
    "taylor": ConvFamily("taylor", squash="intrinsic", post="prelu"),
    "relukan": ConvFamily("relukan", squash="intrinsic", post="act",
                          dropout_site="input",
                          default_base_activation="silu"),
}


# Process-wide defaults for the perf-only knobs below.  Flax modules are
# dataclasses: field defaults are baked into the generated __init__ at
# class creation, so assigning `KanConvND.basis_bf16 = True` after the
# fact does NOT reach instances.  Surfaces that want to flip a knob for
# every layer built afterwards (bench.py variants, serving bf16) call
# set_perf_defaults(); an explicit constructor kwarg always wins.
_PERF_DEFAULTS = {"basis_bf16": False, "island_bf16": False,
                  "basis_build": "concat"}


def set_perf_defaults(**kwargs):
    """Set process-wide defaults for KanConvND's perf-only knobs
    (basis_bf16 / island_bf16 / basis_build).  Returns the previous
    values so callers can restore them."""
    prev = {}
    for k, v in kwargs.items():
        if k not in _PERF_DEFAULTS:
            raise KeyError(f"unknown perf knob {k!r}; "
                           f"have {sorted(_PERF_DEFAULTS)}")
        prev[k] = _PERF_DEFAULTS[k]
        _PERF_DEFAULTS[k] = v
    return prev


def _kprod(kernel_size, ndim):
    if isinstance(kernel_size, (tuple, list)):
        p = 1
        for k in kernel_size:
            p *= int(k)
        return p
    return int(kernel_size) ** ndim


class KanConvND(nn.Module):
    """All-family KAN convolution (channel-last).

    Args mirror the reference ctor vocabulary (input_dim/output_dim,
    kernel_size, groups, padding, stride, dilation, dropout, norm_layer,
    base_activation + family hyperparameters).
    """

    family: str
    input_dim: int
    output_dim: int
    kernel_size: Union[int, Tuple[int, ...]]
    ndim: int = 2
    groups: int = 1
    padding: Union[int, Tuple[int, ...]] = 0
    stride: Union[int, Tuple[int, ...]] = 1
    dilation: Union[int, Tuple[int, ...]] = 1
    dropout: float = 0.0
    norm_layer: Any = InstanceNorm
    norm_kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    base_activation: Any = "__default__"
    # spline-family hyperparams
    grid_size: int = 5
    spline_order: int = 3
    grid_range: Tuple[float, float] = (-1.0, 1.0)
    # polynomial-family hyperparams
    degree: int = 3
    alpha_param: float = 0.0   # gegenbauer
    alpha: float = 1.0         # laguerre
    a: float = 1.0             # jacobi
    b: float = 1.0             # jacobi
    epsilon: float = 1e-7      # cheby clamp
    # relukan hyperparams
    g: int = 5
    k: int = 3
    train_ab: bool = True
    # optional explicit knot/center vector (e.g. a torch-exported grid whose
    # f32 linspace rounding differs from numpy's by 1 ulp)
    grid_override: Any = None
    # fused Pallas kernel: False (default — XLA's conv fusion pipeline
    # measures faster on v5e for every supported shape; per-shape A/B in
    # KERNELS.md), 'auto' (the measured-fastest path — currently identical
    # to False), or True (force the kernels; tests use pallas_interpret)
    use_pallas: Any = False
    pallas_interpret: bool = False
    # opt-in: materialize the basis tensor in bf16 (halves the step's
    # dominant HBM traffic; MXU consumes bf16 natively with f32
    # accumulation).  Off by default — not torch-bit-exact.
    # None = use the process default (set_perf_defaults).
    basis_bf16: Any = None
    # opt-in: run the whole basis->contraction island natively in bf16 —
    # cast the NARROW pre-expansion input (and the weights) to bf16, so
    # the wide (..., K*C) basis tensor AND its autodiff cotangent live in
    # HBM as bf16 with no f32 convert anywhere on the wide path (the
    # basis_bf16 cast-after-expansion variant leaves the backward wide
    # tensor f32 because XLA fuses the convert into the igrad conv's
    # output — measured null).  Conv output is cast back to f32 before
    # norm/activation.  NOT torch-bit-exact; standard bf16 mixed
    # precision.  See BENCH_NOTES.md for the measurement.
    # None = use the process default (set_perf_defaults).
    island_bf16: Any = None
    # how the degree-major basis buffer is assembled from the K column
    # list: 'concat' (jnp.concatenate — lowers to a K-ary chain of
    # dynamic-update-slice fusions, each re-reading x) or 'stack'
    # (stack on a new minor-2 axis + collapsing reshape — bit-identical
    # rows k*C+c, but one fusible producer).  Perf-only switch; see
    # BENCH_NOTES.md for the measured verdict.
    # None = use the process default (set_perf_defaults).
    basis_build: Any = None
    # spatial sharding: set a Mesh (+ axis name, or an ndim-tuple of
    # names/None for multi-axis spatial decomposition) to run both convs
    # with those spatial planes sharded via halo exchange
    # (parallel/halo.py).  Supported scope (round 3): 1/2/3-D, odd 'same'
    # kernels (incl. rectangular), stride dividing the local shard
    # extent, groups (incl. depthwise), dilation; unsupported configs fall
    # back to the plain conv (halo_supported).  The basis expansion is
    # pointwise, so XLA SPMD keeps it local to each shard.  None = the
    # process default (parallel.halo.set_spatial_defaults; axis default
    # 'data'); each ctor arg wins over its default independently.
    spatial_mesh: Any = None
    spatial_axis: Any = None
    param_dtype: Any = jnp.float32

    @property
    def spec(self) -> ConvFamily:
        return FAMILIES[self.family]

    # perf knobs resolve None -> the process default (set_perf_defaults)
    @property
    def _basis_bf16_on(self) -> bool:
        return (_PERF_DEFAULTS["basis_bf16"] if self.basis_bf16 is None
                else self.basis_bf16)

    @property
    def _island_bf16_on(self) -> bool:
        return (_PERF_DEFAULTS["island_bf16"] if self.island_bf16 is None
                else self.island_bf16)

    @property
    def _basis_build_mode(self) -> str:
        return (_PERF_DEFAULTS["basis_build"] if self.basis_build is None
                else self.basis_build)

    @property
    def _spatial_mesh(self):
        return resolve_spatial(self.spatial_mesh, self.spatial_axis)[0]

    @property
    def in_g(self) -> int:
        return self.input_dim // self.groups

    @property
    def out_g(self) -> int:
        return self.output_dim // self.groups

    @property
    def num_basis(self) -> int:
        f = self.family
        if f == "kan":
            return self.grid_size + self.spline_order
        if f == "fastkan":
            return self.grid_size
        if f == "fourier":
            return 2 * self.grid_size
        if f == "relukan":
            return self.g + self.k
        if f == "taylor":
            return self.degree
        return self.degree + 1

    def _act(self):
        if self.base_activation == "__default__":
            return act_lib.ACTIVATIONS[self.spec.default_base_activation]
        fn = act_lib.resolve_activation(self.base_activation)
        return fn if fn is not None else (lambda x: x)

    # ---------------------------------------------------------- params
    def _poly_initializer(self):
        spec = self.spec
        kp = _kprod(self.kernel_size, self.ndim)
        K = self.num_basis
        if spec.poly_init == "ku_linear":
            return init_lib.kaiming_uniform("linear", layout="conv_hwio")
        if spec.poly_init == "ku_5d":
            # reference keeps one 5D tensor (groups, out_g, in_g*K, *k) and
            # kaiming_uniform's over it: fan_in = out_g * in_g*K*kprod
            # (legendre_kan_layers.py:99-108)
            fan_in = self.out_g * self.in_g * K * kp
            bound = math.sqrt(3.0 / fan_in)
            return init_lib.uniform(-bound, bound)
        if spec.poly_init == "normal_full":
            # jacobi_kan_layers.py:115 — std uses the FULL input_dim
            std = 1.0 / (self.input_dim * (self.degree + 1) * kp)
            return init_lib.normal(0.0, std)
        if spec.poly_init == "kn_relu":
            # cheby_kan_layers.py:89-90 — double init, kaiming_normal wins
            return init_lib.kaiming_normal("relu", layout="conv_hwio")
        raise ValueError(spec.poly_init)

    # ---------------------------------------------------------- helpers
    def _channel_dropout(self, x, train: bool, rate: Optional[float] = None):
        """torch DropoutNd parity: drop whole channels per sample."""
        rate = self.dropout if rate is None else rate
        if rate <= 0.0:
            return x
        spatial = tuple(range(1, x.ndim - 1))
        return nn.Dropout(rate=rate, broadcast_dims=spatial)(
            x, deterministic=not train
        )

    def _fastkan_input_norm(self, t, train: bool):
        """FastKAN pre-RBF input norm: one `norm_class(input_dim // groups)`
        instance PER group slice (fast_kan_layers.py:80,106) — not one
        full-width norm.  Identical for per-channel norms (InstanceNorm /
        BatchNorm) but distinct for cross-channel ones.

        Reference quirk reproduced exactly: torch LayerNorm/RMSNorm given
        `normalized_shape=in_g` on an NCHW conv input normalize over the
        LAST torch axis (the trailing spatial dim), which only runs in the
        reference when that dim == in_g.  Channel-last equivalent: swap the
        channel and trailing-spatial axes around the norm (see PARITY.md)."""
        from ..utils.norms import LayerNorm, RMSNorm, resolve_norm

        in_g = self.in_g
        cls = resolve_norm(self.norm_layer)
        trailing = cls in (LayerNorm, RMSNorm) and t.ndim > 2

        def apply(norm, ts):
            if trailing:
                if ts.shape[-2] != in_g:
                    raise ValueError(
                        f"reference {cls.__name__}(in_g={in_g}) on a conv "
                        f"input normalizes the trailing spatial axis and "
                        f"requires it == in_g, got {ts.shape[-2]} "
                        "(fast_kan_layers.py:80)")
                return jnp.swapaxes(
                    norm(jnp.swapaxes(ts, -1, -2), train=train), -1, -2)
            return norm(ts, train=train)

        parts = []
        for g in range(self.groups):
            norm_g = make_norm(self.norm_layer, in_g, name=f"input_norm_{g}",
                               **dict(self.norm_kwargs))
            parts.append(apply(norm_g, t[..., g * in_g:(g + 1) * in_g]))
        return parts[0] if self.groups == 1 else jnp.concatenate(parts, axis=-1)

    def _grouped_minmax_squash(self, x):
        """2(x - min)/(max - min) - 1 with min/max over the whole per-group
        slice including batch (legendre_kan_layers.py:130)."""
        B = x.shape[0]
        spatial = x.shape[1:-1]
        xg = x.reshape((B,) + spatial + (self.groups, self.in_g))
        axes = tuple(i for i in range(xg.ndim) if i != xg.ndim - 2)
        mn = jnp.min(xg, axis=axes, keepdims=True)
        mx = jnp.max(xg, axis=axes, keepdims=True)
        xg = 2.0 * (xg - mn) / (mx - mn) - 1.0
        return xg.reshape(x.shape)

    def _expand(self, x, beta=None):
        """Per-channel basis expansion -> (..., C, K)."""
        f = self.family
        if f == "kan":
            if self.grid_override is not None:
                grid = jnp.asarray(self.grid_override)
            else:
                grid = make_bspline_grid(self.grid_size, self.spline_order,
                                         self.grid_range)
            return bspline_basis(x, grid, self.spline_order)
        if f == "fastkan":
            if self.grid_override is not None:
                grid = jnp.asarray(self.grid_override)
            else:
                grid = make_rbf_grid(self.grid_range[0], self.grid_range[1],
                                     self.grid_size)
            denom = (self.grid_range[1] - self.grid_range[0]) / (self.grid_size - 1)
            return rbf_basis(x, grid, denom)
        if f == "cheby":
            return chebyshev_basis(x, self.degree, self.epsilon)
        if f == "legendre":
            return legendre_basis(x, self.degree)
        if f == "gram":
            return gram_basis(x, self.degree, beta)
        if f == "jacobi":
            return jacobi_basis(x, self.degree, self.a, self.b)
        if f == "bernstein":
            return bernstein_basis(x, self.degree)
        if f == "bessel":
            return bessel_basis(x, self.degree)
        if f == "fibonacci":
            return fibonacci_basis(x, self.degree)
        if f == "fourier":
            return fourier_basis(x, self.grid_size)
        if f == "gegenbauer":
            return gegenbauer_basis(x, self.degree, self.alpha_param)
        if f == "hermite":
            return hermite_basis(x, self.degree)
        if f == "laguerre":
            return laguerre_basis(x, self.degree, self.alpha)
        if f == "lucas":
            return lucas_basis(x, self.degree)
        if f == "taylor":
            return taylor_basis(jnp.tanh(x), self.degree)
        raise ValueError(f)

    def _expand_cols(self, x, beta=None):
        """List-of-K mirror of `_expand`: identical values per column, but
        never materializes the stacked (..., C, K) tensor (whose
        channel-major flatten is a full lane-interleave relayout).
        Returns None for families without an exact list form (relukan)."""
        import numpy as _np

        from ..basis import poly as P
        from ..basis.bspline import bspline_basis_unrolled_list

        f = self.family
        d = self.degree
        if f == "kan":
            if self.grid_override is not None:
                grid = self.grid_override
            else:
                grid = make_bspline_grid(self.grid_size, self.spline_order,
                                         self.grid_range)
            try:
                knots = tuple(float(v) for v in _np.asarray(grid))
            except Exception:
                return None
            return bspline_basis_unrolled_list(x, knots, self.spline_order)
        if f == "fastkan":
            if self.grid_override is not None:
                grid = self.grid_override
            else:
                grid = make_rbf_grid(self.grid_range[0], self.grid_range[1],
                                     self.grid_size)
            denom = (self.grid_range[1] - self.grid_range[0]) / (
                self.grid_size - 1)
            # the single shared static-center fast path (basis/rbf.py)
            return rbf_cols(x, grid, denom)
        if f == "cheby":
            # same trig form as chebyshev_basis (NOT the kernel recurrence)
            t = jnp.tanh(x)
            theta = jnp.arccos(
                jnp.clip(t, -1.0 + self.epsilon, 1.0 - self.epsilon))
            return [jnp.cos(n * theta) for n in range(d + 1)]
        if f == "legendre":
            return P.legendre_basis_list(x, d)
        if f == "gram":
            return P.gram_basis_cols(x, d, beta)
        if f == "jacobi":
            return P.jacobi_basis_list(x, d, self.a, self.b)
        if f == "bernstein":
            return P.bernstein_basis_list(x, d)
        if f == "bessel":
            return P.bessel_basis_list(x, d)
        if f == "fibonacci":
            return P.fibonacci_basis_list(x, d)
        if f == "fourier":
            return P.fourier_basis_list(x, self.grid_size)
        if f == "gegenbauer":
            return P.gegenbauer_basis_list(x, d, self.alpha_param)
        if f == "hermite":
            return P.hermite_basis_list(x, d)
        if f == "laguerre":
            return P.laguerre_basis_list(x, d, self.alpha)
        if f == "lucas":
            return P.lucas_basis_list(x, d)
        if f == "taylor":
            return P.taylor_basis_list(jnp.tanh(x), d)
        return None

    def _expand_flat(self, x):
        """Single-operand degree-major expansion: (..., C) -> (..., K*C)
        computed as ONE elementwise function of a broadcast x with
        per-lane constants, instead of a K-column concat (which XLA
        lowers to a K-ary dynamic-update-slice chain re-reading x per
        column).  Only families whose columns share a parametric form;
        None otherwise (callers fall back to `_expand_cols`).

        fastkan/cheby are bit-identical to the column form; kan uses the
        cardinal-bump evaluation (f32-roundoff-equal, see
        bspline_basis_cardinal_flat)."""
        import numpy as _np

        f = self.family
        C = x.shape[-1]

        def _bcast(t, K):
            tb = jnp.broadcast_to(t[..., None, :], t.shape[:-1] + (K, C))
            return tb.reshape(t.shape[:-1] + (K * C,))

        if f == "kan":
            if self.grid_override is not None:
                grid = self.grid_override
            else:
                grid = make_bspline_grid(self.grid_size, self.spline_order,
                                         self.grid_range)
            from ..basis.bspline import bspline_basis_cardinal_flat
            try:
                knots = tuple(float(v) for v in _np.asarray(grid))
            except Exception:
                return None
            return bspline_basis_cardinal_flat(x, knots, self.spline_order)
        if f == "fastkan":
            if self.grid_override is not None:
                grid = self.grid_override
            else:
                grid = make_rbf_grid(self.grid_range[0], self.grid_range[1],
                                     self.grid_size)
            denom = (self.grid_range[1] - self.grid_range[0]) / (
                self.grid_size - 1)
            try:
                centers = _np.asarray(grid, _np.float32)
            except Exception:
                return None
            K = len(centers)
            lane_c = jnp.asarray(_np.repeat(centers, C), x.dtype)
            u = (_bcast(x, K) - lane_c) / jnp.asarray(
                _np.float32(denom), x.dtype)
            return jnp.exp(-jnp.square(u))
        if f == "cheby":
            t = jnp.tanh(x)
            theta = jnp.arccos(
                jnp.clip(t, -1.0 + self.epsilon, 1.0 - self.epsilon))
            K = self.degree + 1
            n_lane = jnp.asarray(
                _np.repeat(_np.arange(K, dtype=_np.float32), C), x.dtype)
            return jnp.cos(n_lane * _bcast(theta, K))
        return None

    def _flatten_basis(self, basis):
        """(B, *S, C, K) -> (B, *S, G * in_g*K) group-major, with the
        reference's per-family intra-group ordering."""
        B = basis.shape[0]
        spatial = basis.shape[1:-2]
        K = basis.shape[-1]
        bg = basis.reshape((B,) + spatial + (self.groups, self.in_g, K))
        if self.spec.layout == "degree_major":
            # torch.concatenate([P0, P1, ...], dim=1): degree outer, channel
            # inner (legendre_kan_layers.py:124)
            bg = jnp.swapaxes(bg, -1, -2)
        return bg.reshape((B,) + spatial + (self.groups * self.in_g * K,))

    # ---------------------------------------------------------- forward
    @nn.compact
    def __call__(self, x, train: bool = True):
        spec = self.spec
        assert x.shape[-1] == self.input_dim, (
            f"expected {self.input_dim} channels (NHWC), got {x.shape}"
        )
        if self.groups <= 0:
            raise ValueError("groups must be a positive integer")
        if self.input_dim % self.groups or self.output_dim % self.groups:
            raise ValueError("input_dim/output_dim must be divisible by groups")

        act = self._act()
        ks = self.kernel_size
        kshape = tuple(ks) if isinstance(ks, (tuple, list)) else (ks,) * self.ndim
        K = self.num_basis

        conv_kwargs = dict(
            ndim=self.ndim,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )

        # relukan applies dropout to the raw input, affecting both paths
        # (relu_kan_layers.py:118-123)
        if spec.dropout_site == "input" and train:
            x = self._channel_dropout(x, train)

        # parameters (created up front so the fused and jnp paths share them)
        base_w = None
        if spec.has_base:
            base_w = self.param(
                "base_w",
                init_lib.kaiming_uniform("linear", layout="conv_hwio"),
                kshape + (self.in_g, self.output_dim),
                self.param_dtype,
            )
        poly_w = self.param(
            "poly_w",
            self._poly_initializer(),
            kshape + (self.in_g * K, self.output_dim),
            self.param_dtype,
        )

        beta = None
        if self.family == "gram":
            beta = self.param(
                "beta_weights",
                init_lib.normal(
                    0.0,
                    1.0
                    / (
                        _kprod(self.kernel_size, self.ndim)
                        * self.input_dim
                        * (self.degree + 1.0)
                    ),
                ),
                (self.degree + 1,),
                self.param_dtype,
            )

        phase_low = phase_high = None
        if self.family == "relukan":
            low0, high0 = default_phases(self.g, self.k)
            shape = (self.in_g, self.g + self.k)
            if self.train_ab:
                phase_low = self.param(
                    "phase_low",
                    lambda key, s_: jnp.broadcast_to(
                        jnp.asarray(low0), s_).astype(self.param_dtype),
                    shape,
                )
                phase_high = self.param(
                    "phase_high",
                    lambda key, s_: jnp.broadcast_to(
                        jnp.asarray(high0), s_).astype(self.param_dtype),
                    shape,
                )
            else:
                phase_low = jnp.broadcast_to(jnp.asarray(low0), shape)
                phase_high = jnp.broadcast_to(jnp.asarray(high0), shape)

        # ---------------- fused Pallas path (TPU): basis expansion + both
        # convs in one kernel, no HBM basis tensor
        fused = self._maybe_fused(x, base_w, poly_w, act, train, kshape,
                                  beta=beta, phase_low=phase_low,
                                  phase_high=phase_high)
        if fused is not None:
            y = fused
            return self._post_combine(y, act, train)

        # ---------------- base path (input only — the conv itself happens
        # either fused into the spline conv (fast path) or separately below)
        base_in = None
        if spec.has_base:
            base_in = act(x) if spec.base_input == "act" else x

        # ---------------- basis path
        t = x
        if spec.squash == "tanh":
            t = jnp.tanh(x)
        elif spec.squash == "sigmoid":
            t = jax.nn.sigmoid(x)
        elif spec.squash == "batch_minmax":
            t = self._grouped_minmax_squash(x)

        if spec.dropout_site == "basis_input" and train:
            t = self._channel_dropout(t, train)

        if self.family == "fastkan":
            # dropout on x, then per-group input norm, then RBF
            # (fast_kan_layers.py:100-108)
            if train:
                t = self._channel_dropout(t, train)
            t = self._fastkan_input_norm(t, train)

        if self._island_bf16_on:
            # bf16 compute island (see flag docstring): cast the NARROW
            # tensors; everything wide downstream (basis, cotangents) is
            # then natively bf16.  Squash/norm above stay f32.
            if t.dtype == jnp.float32:
                t = t.astype(jnp.bfloat16)
            if base_in is not None and base_in.dtype == jnp.float32:
                base_in = base_in.astype(jnp.bfloat16)
            if poly_w.dtype == jnp.float32:
                poly_w = poly_w.astype(jnp.bfloat16)
            if base_w is not None and base_w.dtype == jnp.float32:
                base_w = base_w.astype(jnp.bfloat16)

        # ------- degree-major fast path (groups==1): the channel-major
        # flatten of the stacked (..., C, K) basis forces a full lane
        # interleave — profiled at ~4.6 ms/step of pure relayout copies on
        # the KAN-VGG16_small train step (17% of device time).  Building
        # the basis as a lane-CONCAT of the K list columns is layout-free;
        # the row permutation moves onto the (tiny) weight tensor instead.
        cols = None
        flat_bcast = None
        if self.groups == 1 and not (spec.dropout_site == "basis" and train
                                     and self.dropout > 0):
            if self._basis_build_mode == "bcast":
                flat_bcast = self._expand_flat(t)
            if flat_bcast is None:
                cols = self._expand_cols(t, beta=beta)
        if cols is not None or flat_bcast is not None:
            def _assemble(parts):
                # rows k*C + c, either way; 'stack' collapses a new
                # minor-2 axis so the whole buffer has ONE elementwise
                # producer instead of a len(parts)-ary concat chain
                if self._basis_build_mode == "stack":
                    C_ = parts[0].shape[-1]
                    return jnp.stack(parts, axis=-2).reshape(
                        parts[0].shape[:-1] + (len(parts) * C_,))
                return jnp.concatenate(parts, axis=-1)

            base_folded = False
            if flat_bcast is not None:
                # single-operand broadcast form: already rows k*C + c
                flat_dm = flat_bcast
                K_count = flat_bcast.shape[-1] // self.input_dim
            elif (base_in is not None and not spec.basis_act
                    and self._basis_build_mode == "stack"
                    and base_in.shape[-1] == cols[0].shape[-1]):
                # base path joins the same stack (rows [K*C | C])
                flat_dm = _assemble(cols + [base_in])
                base_folded = True
                K_count = len(cols)
            else:
                flat_dm = _assemble(cols)
                K_count = len(cols)
            if spec.basis_act:
                flat_dm = act(flat_dm)
            pw = poly_w
            if spec.layout != "degree_major":
                # param rows are channel-major (c*K + k, reference layout);
                # permute once per step — O(|w|), not O(|activations|)
                C, K_ = self.input_dim, K_count
                pw = poly_w.reshape(kshape + (C, K_, self.output_dim))
                pw = jnp.swapaxes(pw, -3, -2).reshape(
                    kshape + (K_ * C, self.output_dim))
            if base_in is not None:
                # fold the base path into the SAME contraction: one conv
                # over rows [K*C basis | C base] instead of two
                # lane-starved convs (the base conv's 9*C-deep contraction
                # is the shallowest pass in the whole net)
                if not base_folded:
                    flat_dm = jnp.concatenate([flat_dm, base_in], axis=-1)
                pw = jnp.concatenate([pw, base_w], axis=-2)
            # tag the wide basis tensor for selective-remat policies
            # (ops/remat_policy.py 'except_basis'/'offload_basis'); free
            # identity outside jax.checkpoint
            from jax.ad_checkpoint import checkpoint_name
            flat_dm = checkpoint_name(flat_dm, "kan_basis")
            if self._basis_bf16_on and flat_dm.dtype == jnp.float32:
                # opt-in perf mode: store the materialized basis tensor
                # (the step's dominant HBM traffic) in bf16; the MXU
                # consumes bf16 natively and accumulates f32.  NOT
                # torch-bit-exact — off by default, see BENCH_NOTES.md.
                flat_dm = flat_dm.astype(jnp.bfloat16)
                pw = pw.astype(jnp.bfloat16)
            y = self._conv(flat_dm, pw, conv_kwargs)
            if y.dtype != x.dtype:
                y = y.astype(x.dtype)
            return self._post_combine(y, act, train)

        base_out = None
        if base_in is not None:
            base_out = self._conv(base_in, base_w, conv_kwargs)

        if self.family == "relukan":
            # phases are per in-group channel, shared across groups
            # (relu_kan_layers.py:99-105)
            pl = jnp.tile(phase_low, (self.groups, 1))
            ph = jnp.tile(phase_high, (self.groups, 1))
            basis = relukan_basis(t, pl, ph, self.g, self.k)
        else:
            basis = self._expand(t, beta=beta)

        if spec.basis_act:
            basis = act(basis)

        if spec.dropout_site == "basis" and train:
            # jacobi: Dropout2d over the expanded (C*(deg+1)) channels
            # (jacobi_kan_layers.py:148-149)
            B = basis.shape[0]
            spatial = basis.shape[1:-2]
            flat = basis.reshape((B,) + spatial + (basis.shape[-2] * basis.shape[-1],))
            flat = self._channel_dropout(flat, train)
            basis = flat.reshape(basis.shape)

        from jax.ad_checkpoint import checkpoint_name

        basis_flat = self._flatten_basis(basis)
        basis_flat = checkpoint_name(basis_flat, "kan_basis")
        if self._basis_bf16_on and basis_flat.dtype == jnp.float32:
            # same opt-in bf16 basis storage as the degree-major fast
            # path above — previously silently ignored on this generic
            # (groups>1 / relukan / basis-dropout) path
            basis_flat = basis_flat.astype(jnp.bfloat16)
            poly_w = poly_w.astype(jnp.bfloat16)
        spline_out = self._conv(basis_flat, poly_w, conv_kwargs)

        y = spline_out if base_out is None else base_out + spline_out
        if y.dtype != x.dtype:
            y = y.astype(x.dtype)
        return self._post_combine(y, act, train)

    def _conv(self, x, w, conv_kwargs):
        """Plain conv, or halo-exchange conv with spatial planes sharded
        over `spatial_axis` when spatially sharded and eligible (1/2/3-D;
        stride / groups / dilation supported — parallel/halo.py).  Ctor
        args and the process defaults resolve in maybe_sharded_conv."""
        return maybe_sharded_conv(self.spatial_mesh, self.spatial_axis,
                                  x, w, **conv_kwargs)

    def _post_combine(self, y, act, train):
        spec = self.spec
        if spec.norm_on == "output":
            norm = make_norm(self.norm_layer, self.output_dim,
                             **dict(self.norm_kwargs))
            y = norm(y, train=train)

        if spec.post == "prelu":
            alpha = self.param(
                "prelu", init_lib.constant(0.25), (self.groups,), self.param_dtype
            )
            # per-group scalar slope (reference keeps one nn.PReLU per group,
            # kan_layers.py:182)
            slope = jnp.repeat(alpha, self.out_g)
            y = jnp.where(y >= 0, y, slope * y)
        elif spec.post == "act":
            y = act(y)

        if spec.dropout_site == "output" and train:
            y = self._channel_dropout(y, train)
        return y

    # families fusable into the Pallas kernel: pure static basis functions
    # plus gram/relukan (their learnable basis params ride in as kernel
    # operands).  Excluded: fastkan (input-norm stats must exclude the
    # spatial zero-pad), legendre (batch-global min-max), wavkan (per-
    # (out,in) expansion lives in nn/wav_conv.py).
    _FUSABLE = frozenset({
        "kan", "cheby", "jacobi", "bernstein", "bessel", "fibonacci",
        "fourier", "gegenbauer", "hermite", "laguerre", "lucas", "taylor",
        "gram", "relukan",
    })

    def _fused_basis_list_fn(self, act):
        """Kernel-side basis: a function returning a LIST of K (..., C)
        arrays (Mosaic cannot reshape a trailing (C, K) pair), with the
        family squash folded in and no captured constant arrays.  Learnable
        basis params (gram beta, relukan phases) arrive as extra args."""
        from ..basis import poly as P
        from ..basis.bspline import bspline_basis_unrolled_list
        from ..basis.poly import fourier_basis_list

        fam = self.family
        spec = self.spec
        sq = {"tanh": jnp.tanh, "sigmoid": jax.nn.sigmoid}.get(spec.squash)
        d = self.degree

        if fam == "gram":
            # tanh squash, then act(basis) before the conv
            # (gram_kan_layers.py:172-185)
            def gram_list(xt, beta):
                t = jnp.tanh(xt)
                p0 = jnp.ones_like(t)
                if d == 0:
                    return [act(p0)]
                p1 = t
                out = [p0, p1]
                for i in range(2, d + 1):
                    n, m = i - 1, i
                    coef = ((m + n) * (m - n) * n**2) / (
                        m**2 / (4.0 * n**2 - 1.0))
                    p2 = t * p1 - (coef * beta[n]) * p0
                    out.append(p2)
                    p0, p1 = p1, p2
                return [act(b) for b in out]

            return gram_list
        if fam == "relukan":
            g_, k_ = self.g, self.k
            r = 4.0 * g_ * g_ / ((k_ + 1.0) * (k_ + 1.0))

            def relukan_list(xt, pl, ph):
                out = []
                for j in range(g_ + k_):
                    b = (jnp.maximum(xt - pl[:, j], 0.0)
                         * jnp.maximum(ph[:, j] - xt, 0.0) * r)
                    out.append(b * b)
                return out

            return relukan_list

        if fam == "kan":
            knots = (tuple(self.grid_override)
                     if self.grid_override is not None
                     else tuple(float(v) for v in make_bspline_grid(
                         self.grid_size, self.spline_order, self.grid_range)))
            return lambda xt: bspline_basis_unrolled_list(
                xt, knots, self.spline_order)
        if fam == "cheby":
            # acos has no Mosaic lowering; the recurrence form is
            # mathematically identical
            return lambda xt: P.chebyshev_basis_recurrence_list(
                xt, d, self.epsilon)
        if fam == "taylor":
            return lambda xt: P.taylor_basis_list(jnp.tanh(xt), d)
        if fam == "fourier":
            return lambda xt: fourier_basis_list(xt, self.grid_size)

        fns = {
            "jacobi": lambda t: P.jacobi_basis_list(t, d, self.a, self.b),
            "bernstein": lambda t: P.bernstein_basis_list(t, d),
            "bessel": lambda t: P.bessel_basis_list(t, d),
            "fibonacci": lambda t: P.fibonacci_basis_list(t, d),
            "gegenbauer": lambda t: P.gegenbauer_basis_list(
                t, d, self.alpha_param),
            "hermite": lambda t: P.hermite_basis_list(t, d),
            "laguerre": lambda t: P.laguerre_basis_list(t, d, self.alpha),
            "lucas": lambda t: P.lucas_basis_list(t, d),
        }
        fn = fns[fam]
        return lambda xt: fn(sq(xt) if sq is not None else xt)

    def _maybe_fused(self, x, base_w, poly_w, act, train, kshape,
                     beta=None, phase_low=None, phase_high=None):
        """Returns the fused pre-norm output, or None to use the jnp path."""
        from ..kernels.fused_kan_conv import make_fused_kan_conv_op, supported

        spec = self.spec
        if not self.use_pallas or self.family not in self._FUSABLE:
            return None
        if self.ndim != 2:
            # the fused kernels are 2-D only; guard BEFORE the NHWC shape
            # unpack below (a 1-D (B, L, C) input has no x.shape[3])
            return None
        if self.use_pallas == "auto":
            # 'auto' means "the measured-fastest path": per the round-2
            # per-shape A/B (KERNELS.md), that is the XLA path on every
            # supported config, so 'auto' never engages the kernels today.
            # use_pallas=True still forces them (tests, future hardware).
            return None
        if self._island_bf16_on:
            # the fused kernels are f32-only; running them under
            # island_bf16 would silently compare different numerics in
            # any pallas-vs-XLA A/B — the island takes priority
            return None
        if self._spatial_mesh is not None:
            # spatially sharded inputs go through the halo-exchange conv
            # (parallel/halo.py); a pallas_call on a sharded global array
            # would force a gather
            return None
        # pre-basis dropout can't cross the kernel boundary ('input'-site
        # dropout is fine: it applies to x before both paths)
        if train and self.dropout > 0 and spec.dropout_site not in (
                "output", "input"):
            return None
        if len(set(kshape)) != 1 or x.dtype != jnp.float32:
            return None
        pad = self.padding
        if isinstance(pad, (tuple, list)):
            if len(set(pad)) != 1:
                return None
            pad = pad[0]
        B, H, W, C = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
        from ..kernels.wide_kan_conv import wide_supported
        v1_ok = supported(self.ndim, self.stride, self.dilation, self.groups,
                          kshape[0], H, W, C, self.num_basis,
                          self.output_dim, pad)
        wide_ok = wide_supported(self.ndim, self.stride, self.dilation,
                                 self.groups, kshape[0], H, W, C,
                                 self.num_basis, self.output_dim, pad,
                                 self.spec.has_base)
        if not (v1_ok or wide_ok):
            return None

        basis_list_fn = self._fused_basis_list_fn(act)
        extras = ()
        if self.family == "gram":
            extras = (beta,)
        elif self.family == "relukan":
            extras = (phase_low, phase_high)
        base_act = None
        if spec.has_base and spec.base_input == "act":
            base_act = act
        dummy = base_w if base_w is not None else jnp.zeros((), x.dtype)

        # Prefer the wide-matmul kernel (fused fwd AND bwd, full-lane MXU
        # contractions — kernels/wide_kan_conv.py); fall back to the v1
        # per-tap kernel where the wide working set does not fit.
        from .. import config as _cfg
        from ..kernels.wide_kan_conv import make_wide_kan_conv_op
        if wide_ok:
            op = make_wide_kan_conv_op(
                basis_list_fn=basis_list_fn, num_basis=self.num_basis,
                base_act=base_act, kernel_size=kshape[0], padding=int(pad),
                degree_major=(spec.layout == "degree_major"),
                has_base=spec.has_base, interpret=self.pallas_interpret,
                compute_dtype=_cfg.get_matmul_dtype())
            return op(x, dummy, poly_w, *extras)

        op, _ = make_fused_kan_conv_op(
            basis_list_fn=basis_list_fn, num_basis=self.num_basis,
            base_act=base_act, kernel_size=kshape[0], padding=int(pad),
            degree_major=(spec.layout == "degree_major"),
            has_base=spec.has_base, interpret=self.pallas_interpret)
        return op(x, dummy, poly_w, *extras)


def make_kan_conv(family: str, ndim: int, **kwargs) -> KanConvND:
    return KanConvND(family=family, ndim=ndim, **kwargs)


# Reference-named convenience constructors (KANConv2DLayer etc.).  These are
# functions returning configured modules — TPU-side we favour composition
# over 3x17 subclasses.
_FAMILY_CTOR_DEFAULTS = {
    # fast_kan_layers.py:137-148: grid_size=8, grid_range=[-2, 2]
    "fastkan": dict(grid_size=8, grid_range=(-2.0, 2.0)),
}


def _named(family: str, ndim: int):
    def ctor(input_dim, output_dim, kernel_size, **kwargs):
        kwargs.setdefault("norm_layer", InstanceNorm)
        for k, v in _FAMILY_CTOR_DEFAULTS.get(family, {}).items():
            kwargs.setdefault(k, v)
        return KanConvND(
            family=family,
            input_dim=input_dim,
            output_dim=output_dim,
            kernel_size=kernel_size,
            ndim=ndim,
            **kwargs,
        )

    ctor.__name__ = f"{family}_conv{ndim}d"
    return ctor


KANConv1DLayer = _named("kan", 1)
KANConv2DLayer = _named("kan", 2)
KANConv3DLayer = _named("kan", 3)
FastKANConv1DLayer = _named("fastkan", 1)
FastKANConv2DLayer = _named("fastkan", 2)
FastKANConv3DLayer = _named("fastkan", 3)
ChebyKANConv1DLayer = _named("cheby", 1)
ChebyKANConv2DLayer = _named("cheby", 2)
ChebyKANConv3DLayer = _named("cheby", 3)
LegendreKANConv1DLayer = _named("legendre", 1)
LegendreKANConv2DLayer = _named("legendre", 2)
LegendreKANConv3DLayer = _named("legendre", 3)
GRAMKANConv1DLayer = _named("gram", 1)
GRAMKANConv2DLayer = _named("gram", 2)
GRAMKANConv3DLayer = _named("gram", 3)
JacobiKANConv1DLayer = _named("jacobi", 1)
JacobiKANConv2DLayer = _named("jacobi", 2)
JacobiKANConv3DLayer = _named("jacobi", 3)
BersnsteinKANConv1DLayer = _named("bernstein", 1)
BersnsteinKANConv2DLayer = _named("bernstein", 2)
BersnsteinKANConv3DLayer = _named("bernstein", 3)
BesselKANConv1DLayer = _named("bessel", 1)
BesselKANConv2DLayer = _named("bessel", 2)
BesselKANConv3DLayer = _named("bessel", 3)
FibonacciKANConv1DLayer = _named("fibonacci", 1)
FibonacciKANConv2DLayer = _named("fibonacci", 2)
FibonacciKANConv3DLayer = _named("fibonacci", 3)
FourierKANConv1DLayer = _named("fourier", 1)
FourierKANConv2DLayer = _named("fourier", 2)
FourierKANConv3DLayer = _named("fourier", 3)
GegenbauerKANConv1DLayer = _named("gegenbauer", 1)
GegenbauerKANConv2DLayer = _named("gegenbauer", 2)
GegenbauerKANConv3DLayer = _named("gegenbauer", 3)
HermiteKANConv1DLayer = _named("hermite", 1)
HermiteKANConv2DLayer = _named("hermite", 2)
HermiteKANConv3DLayer = _named("hermite", 3)
LaguerreKANConv1DLayer = _named("laguerre", 1)
LaguerreKANConv2DLayer = _named("laguerre", 2)
LaguerreKANConv3DLayer = _named("laguerre", 3)
LucasKANConv1DLayer = _named("lucas", 1)
LucasKANConv2DLayer = _named("lucas", 2)
LucasKANConv3DLayer = _named("lucas", 3)
ReLUKANConv1DLayer = _named("relukan", 1)
ReLUKANConv2DLayer = _named("relukan", 2)
ReLUKANConv3DLayer = _named("relukan", 3)
TaylorKANConv1DLayer = _named("taylor", 1)
TaylorKANConv2DLayer = _named("taylor", 2)
TaylorKANConv3DLayer = _named("taylor", 3)
