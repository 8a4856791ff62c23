"""Small building-block layers shared by the model zoo: Linear with torch
default init, DropPath (stochastic depth) and SqueezeExcitation.

Reference points: DropPath/drop_path (models/kan_efficientnet.py:31-64),
torchvision SqueezeExcitation used at models/kan_mobilenetv3.py:8 and
models/kan_efficientnet.py:10.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import initializers as init_lib


class Linear(nn.Module):
    """torch.nn.Linear parity (kaiming_uniform a=sqrt(5) + uniform bias)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "w",
            init_lib.kaiming_uniform("leaky_relu", a=math.sqrt(5.0),
                                     layout="linear_io"),
            (self.in_features, self.out_features), self.param_dtype)
        y = x @ w
        if self.use_bias:
            b = self.param("b", init_lib.torch_linear_bias(self.in_features),
                           (self.out_features,), self.param_dtype)
            y = y + b
        return y


class DropPath(nn.Module):
    """Per-sample stochastic depth (models/kan_efficientnet.py:31-50):
    binary keep mask per sample, scaled by 1/keep_prob."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.drop_prob == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class SqueezeExcitation(nn.Module):
    """torchvision.ops.SqueezeExcitation parity (NHWC): global avg pool ->
    1x1 conv (fc1, bias) -> act -> 1x1 conv (fc2, bias) -> scale_act -> *x."""

    input_channels: int
    squeeze_channels: int
    activation: Callable = jax.nn.relu
    scale_activation: Callable = jax.nn.sigmoid
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        spatial = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x, axis=spatial, keepdims=True)
        ku = init_lib.kaiming_uniform("leaky_relu", a=math.sqrt(5.0),
                                      layout="conv_hwio")
        w1 = self.param("fc1_w", ku,
                        (1, 1, self.input_channels, self.squeeze_channels),
                        self.param_dtype)
        b1 = self.param("fc1_b", init_lib.torch_linear_bias(self.input_channels),
                        (self.squeeze_channels,), self.param_dtype)
        w2 = self.param("fc2_w", ku,
                        (1, 1, self.squeeze_channels, self.input_channels),
                        self.param_dtype)
        b2 = self.param("fc2_b", init_lib.torch_linear_bias(self.squeeze_channels),
                        (self.input_channels,), self.param_dtype)
        s = self.activation(jnp.einsum("...c,hwco->...o", s, w1) + b1)
        s = self.scale_activation(jnp.einsum("...c,hwco->...o", s, w2) + b2)
        return x * s
