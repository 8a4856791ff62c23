"""CONV_KAN_FACTORY — parity with layers/kan_conv.py:27-745.

Each builder keeps the reference signature
    (in_planes, out_planes, kernel_size, ..., l1_decay, dropout,
     norm_layer, **norm_kwargs)
with automatic 'same' padding when `padding` is None
(layers/kan_conv.py:12-25) and returns a configured Flax module.

`l1_decay` note: when `l1_decay > 0` the built layer is wrapped in
utils.regularization.L1, which sows a true per-layer L1 penalty into the
'losses' collection consumed by the training loop — layer-scoped exactly
like the reference's wrapper interface implies (the reference's hook
itself is inert; PARITY.md documents the deviation).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn

from ..nn.kan_conv import KanConvND
from ..nn.wav_conv import WavKANConvND
from ..ops.conv import same_padding
from ..ops.std_conv import StdConvBlock
from ..utils.norms import BatchNorm, InstanceNorm, resolve_norm
from ..utils.regularization import L1


def _mark_l1(module, l1_decay: float):
    if l1_decay and l1_decay > 0:
        return L1(layer=module, weight_decay=float(l1_decay))
    return module


def l1_decay_of(module) -> float:
    """Decay of an L1-wrapped module (0.0 for unwrapped modules)."""
    return module.weight_decay if isinstance(module, L1) else 0.0


def _pad(padding, kernel_size, dilation):
    return same_padding(kernel_size, dilation) if padding is None else padding


def kan_conv(in_planes, out_planes, kernel_size, spline_order=3, groups=1,
             stride=1, dilation=1, padding=None, grid_size=5,
             base_activation="gelu", grid_range=(-1, 1), l1_decay=0.0,
             dropout=0.0, norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:27-69."""
    conv = KanConvND(
        family="kan", input_dim=in_planes, output_dim=out_planes,
        kernel_size=kernel_size, ndim=2, spline_order=spline_order,
        stride=stride, padding=_pad(padding, kernel_size, dilation),
        dilation=dilation, groups=groups, grid_size=grid_size,
        base_activation=base_activation, grid_range=tuple(grid_range),
        dropout=dropout, norm_layer=resolve_norm(norm_layer),
        norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


def conv(in_planes, out_planes, kernel_size, groups=1, stride=1, dilation=1,
         padding=None, base_activation="gelu", norm_layer=BatchNorm,
         l1_decay=0.0, dropout=0.0, norm_kwargs=None, **kwargs):
    """Standard Dropout->Conv->Norm->Act block (layers/kan_conv.py:71-117).

    **kwargs are accepted and DROPPED — the reference's `conv()` does the
    same (its norm is built bare as `norm_layer(out_planes)`), so e.g.
    `affine` passed by a model factory never reaches the norm here.  The
    explicit `norm_kwargs` dict is the analogue of the reference's
    partial'd norm_layer channel (models like MNv3 bake eps/momentum into
    the norm_layer they hand every factory call, kan_mobilenetv3.py:246,
    307)."""
    block = StdConvBlock(
        in_planes=in_planes, out_planes=out_planes, kernel_size=kernel_size,
        groups=groups, stride=stride, dilation=dilation,
        padding=_pad(padding, kernel_size, dilation),
        base_activation=base_activation, norm_layer=resolve_norm(norm_layer),
        norm_kwargs=dict(norm_kwargs or {}), dropout=dropout)
    return _mark_l1(block, l1_decay)


def fastkan_conv(in_planes, out_planes, kernel_size, groups=1, stride=1,
                 dilation=1, padding=None, grid_size=8,
                 base_activation="silu", grid_range=(-2, 2), l1_decay=0.0,
                 dropout=0.0, norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:235-276."""
    conv = KanConvND(
        family="fastkan", input_dim=in_planes, output_dim=out_planes,
        kernel_size=kernel_size, ndim=2, stride=stride,
        padding=_pad(padding, kernel_size, dilation), dilation=dilation,
        groups=groups, grid_size=grid_size, base_activation=base_activation,
        grid_range=tuple(grid_range), dropout=dropout,
        norm_layer=resolve_norm(norm_layer), norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


def _poly_conv(family):
    def builder(in_planes, out_planes, kernel_size, degree=3, groups=1,
                stride=1, dilation=1, padding=None, l1_decay=0.0, dropout=0.0,
                base_activation="__default__", norm_layer=InstanceNorm,
                **extra):
        hyper = {}
        for key in ("alpha_param", "alpha", "a", "b", "g", "k", "train_ab",
                    "grid_size"):
            if key in extra:
                hyper[key] = extra.pop(key)
        conv = KanConvND(
            family=family, input_dim=in_planes, output_dim=out_planes,
            kernel_size=kernel_size, ndim=2, degree=degree, stride=stride,
            padding=_pad(padding, kernel_size, dilation), dilation=dilation,
            groups=groups, dropout=dropout, base_activation=base_activation,
            norm_layer=resolve_norm(norm_layer), norm_kwargs=extra, **hyper)
        return _mark_l1(conv, l1_decay)

    builder.__name__ = f"{family}kan_conv"
    return builder


legendrekan_conv = _poly_conv("legendre")      # layers/kan_conv.py:120-156
gramkan_conv = _poly_conv("gram")              # :158-194
chebykan_conv = _poly_conv("cheby")            # :197-232
bersnsteinkan_conv = _poly_conv("bernstein")   # :319-352
besselkan_conv = _poly_conv("bessel")          # :354-388
fibonaccikan_conv = _poly_conv("fibonacci")    # :391-425
hermitekan_conv = _poly_conv("hermite")        # :502-536
lucaskan_conv = _poly_conv("lucas")            # :616-650
taylorkan_conv = _poly_conv("taylor")          # :692-724


def fourierkan_conv(in_planes, out_planes, kernel_size, groups=1, stride=1,
                    dilation=1, padding=None, l1_decay=0.0, dropout=0.0,
                    grid_size=3, base_activation="gelu",
                    norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:427-461 — note grid_size default of 3 for convs."""
    conv = KanConvND(
        family="fourier", input_dim=in_planes, output_dim=out_planes,
        kernel_size=kernel_size, ndim=2, grid_size=grid_size, stride=stride,
        padding=_pad(padding, kernel_size, dilation), dilation=dilation,
        groups=groups, dropout=dropout, base_activation=base_activation,
        norm_layer=resolve_norm(norm_layer), norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


def gegenbauerkan_conv(in_planes, out_planes, kernel_size, groups=1, stride=1,
                       dilation=1, padding=None, l1_decay=0.0, dropout=0.0,
                       degree=3, alpha_param=0.0, base_activation="gelu",
                       norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:464-500."""
    conv = KanConvND(
        family="gegenbauer", input_dim=in_planes, output_dim=out_planes,
        kernel_size=kernel_size, ndim=2, degree=degree,
        alpha_param=alpha_param, stride=stride,
        padding=_pad(padding, kernel_size, dilation), dilation=dilation,
        groups=groups, dropout=dropout, base_activation=base_activation,
        norm_layer=resolve_norm(norm_layer), norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


def jacobikan_conv(in_planes, out_planes, kernel_size, groups=1, stride=1,
                   dilation=1, padding=None, l1_decay=0.0, dropout=0.0,
                   degree=3, a=1.0, b=1.0, base_activation="gelu",
                   norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:538-576."""
    conv = KanConvND(
        family="jacobi", input_dim=in_planes, output_dim=out_planes,
        kernel_size=kernel_size, ndim=2, degree=degree, a=a, b=b,
        stride=stride, padding=_pad(padding, kernel_size, dilation),
        dilation=dilation, groups=groups, dropout=dropout,
        base_activation=base_activation, norm_layer=resolve_norm(norm_layer),
        norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


def laguerrekan_conv(in_planes, out_planes, kernel_size, groups=1, stride=1,
                     dilation=1, padding=None, l1_decay=0.0, dropout=0.0,
                     degree=3, alpha=1.0, base_activation="gelu",
                     norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:578-614."""
    conv = KanConvND(
        family="laguerre", input_dim=in_planes, output_dim=out_planes,
        kernel_size=kernel_size, ndim=2, degree=degree, alpha=alpha,
        stride=stride, padding=_pad(padding, kernel_size, dilation),
        dilation=dilation, groups=groups, dropout=dropout,
        base_activation=base_activation, norm_layer=resolve_norm(norm_layer),
        norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


def relukan_conv(in_planes, out_planes, kernel_size, groups=1, stride=1,
                 dilation=1, padding=None, l1_decay=0.0, dropout=0.0, g=5,
                 k=3, train_ab=True, base_activation="gelu",
                 norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:652-690."""
    conv = KanConvND(
        family="relukan", input_dim=in_planes, output_dim=out_planes,
        kernel_size=kernel_size, ndim=2, g=g, k=k, train_ab=train_ab,
        stride=stride, padding=_pad(padding, kernel_size, dilation),
        dilation=dilation, groups=groups, dropout=dropout,
        base_activation=base_activation, norm_layer=resolve_norm(norm_layer),
        norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


def wavkan_conv(in_planes, out_planes, kernel_size, groups=1, stride=1,
                dilation=1, padding=None, l1_decay=0.0, dropout=0.0,
                wavelet_type="mexican_hat", wav_version="fast",
                norm_layer=InstanceNorm, **norm_kwargs):
    """layers/kan_conv.py:278-317 — note the factory's InstanceNorm default
    (the bare layer class defaults to BatchNorm)."""
    conv = WavKANConvND(
        input_dim=in_planes, output_dim=out_planes, kernel_size=kernel_size,
        ndim=2, stride=stride, padding=_pad(padding, kernel_size, dilation),
        dilation=dilation, groups=groups, wavelet_type=wavelet_type,
        wav_version=wav_version, dropout=dropout,
        norm_layer=resolve_norm(norm_layer), norm_kwargs=norm_kwargs)
    return _mark_l1(conv, l1_decay)


# layers/kan_conv.py:726-745 — identical 18 keys
CONV_KAN_FACTORY: dict[str, Callable] = {
    "KAN": kan_conv,
    "FastKAN": fastkan_conv,
    "LegendreKAN": legendrekan_conv,
    "GRAMKAN": gramkan_conv,
    "ChebyKAN": chebykan_conv,
    "WavKAN": wavkan_conv,
    "BersnsteinKAN": bersnsteinkan_conv,
    "BesselKAN": besselkan_conv,
    "FibonacciKAN": fibonaccikan_conv,
    "FourierKAN": fourierkan_conv,
    "GegenbauerKAN": gegenbauerkan_conv,
    "HermiteKAN": hermitekan_conv,
    "JacobiKAN": jacobikan_conv,
    "LaguerreKAN": laguerrekan_conv,
    "LucasKAN": lucaskan_conv,
    "ReLUKAN": relukan_conv,
    "TaylorKAN": taylorkan_conv,
    "conv": conv,
}
