"""Standard (non-KAN) conv block: Dropout? -> Conv -> Norm -> Act.

Parity with the reference's `conv()` Sequential (layers/kan_conv.py:71-117):
bias only when norm_layer is None; torch Conv2d default init
(kaiming_uniform a=sqrt(5), bias U(+-1/sqrt(fan_in))).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..utils import activations as act_lib
from ..utils import initializers as init_lib
from ..utils.norms import make_norm
from .conv import conv_nd


class Conv(nn.Module):
    """Plain channel-last conv with torch-default init."""

    in_planes: int
    out_planes: int
    kernel_size: Union[int, Tuple[int, ...]]
    ndim: int = 2
    stride: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    dilation: Union[int, Tuple[int, ...]] = 1
    groups: int = 1
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        kshape = tuple(ks) if isinstance(ks, (tuple, list)) else (ks,) * self.ndim
        in_g = self.in_planes // self.groups
        w = self.param(
            "w",
            init_lib.kaiming_uniform("leaky_relu", a=math.sqrt(5.0),
                                     layout="conv_hwio"),
            kshape + (in_g, self.out_planes), self.param_dtype)
        # honor the process-wide spatial sharding default
        # (parallel.halo.set_spatial_defaults), so mixed KAN/std models
        # (MobileNets, EfficientNets) halo-shard their std convs too
        from ..parallel.halo import maybe_sharded_conv

        y = maybe_sharded_conv(
            None, None, x, w, ndim=self.ndim, stride=self.stride,
            padding=self.padding, dilation=self.dilation,
            groups=self.groups)
        if self.use_bias:
            fan_in = in_g
            for k in kshape:
                fan_in *= k
            b = self.param("b", init_lib.torch_linear_bias(fan_in),
                           (self.out_planes,), self.param_dtype)
            y = y + b
        return y


class StdConvBlock(nn.Module):
    in_planes: int
    out_planes: int
    kernel_size: Union[int, Tuple[int, ...]]
    ndim: int = 2
    groups: int = 1
    stride: Union[int, Tuple[int, ...]] = 1
    dilation: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    base_activation: Any = "gelu"
    norm_layer: Any = None
    norm_kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    dropout: float = 0.0
    # None -> reference default (bias only without a norm).  MobileNetV2's
    # ConvNormActivation instead uses `bias = norm_layer is None or not
    # affine` (kan_mobilenetv2.py:47,294) — its model passes the resolved
    # value explicitly.
    use_bias: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dropout > 0:
            # reference uses plain nn.Dropout here (element-wise)
            x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
        bias = (self.norm_layer is None if self.use_bias is None
                else self.use_bias)
        y = Conv(
            in_planes=self.in_planes, out_planes=self.out_planes,
            kernel_size=self.kernel_size, ndim=self.ndim, stride=self.stride,
            padding=self.padding, dilation=self.dilation, groups=self.groups,
            use_bias=bias)(x)
        if self.norm_layer is not None:
            y = make_norm(self.norm_layer, self.out_planes,
                          **dict(self.norm_kwargs))(y, train=train)
        act = act_lib.resolve_activation(self.base_activation)
        if act is not None:
            y = act(y)
        return y
