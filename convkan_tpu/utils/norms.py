"""Normalization layers with exact PyTorch numerics, channel-last (NHWC).

The reference exposes BatchNorm2d / InstanceNorm2d / GroupNorm / RMSNorm /
LayerNorm through a string map (train.py:24-30) and instantiates them with
`inspect.signature`-filtered kwargs (layers/kan_layers.py:178-181).  We keep
the same names and defaults:

  * InstanceNorm: eps=1e-5, affine=False, no running stats; normalizes over
    spatial dims per (sample, channel) in both train and eval (torch default
    track_running_stats=False).
  * BatchNorm:    eps=1e-5, momentum=0.1, affine=True, running stats
    (biased variance for normalization, unbiased for the running update —
    matching torch.nn.BatchNorm).
  * LayerNorm:    eps=1e-5, elementwise affine over the trailing dims.
  * GroupNorm:    eps=1e-5, affine=True.
  * RMSNorm:      matches torch.nn.RMSNorm (weight-only affine).

All modules take channel-last inputs (..., C).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class InstanceNorm(nn.Module):
    """torch.nn.InstanceNormNd parity for channel-last inputs (B, *S, C)."""

    num_features: int
    eps: float = 1e-5
    affine: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # normalize over the spatial axes only (1..ndim-2)
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            shape = (1,) * (x.ndim - 1) + (self.num_features,)
            weight = self.param("weight",
                                lambda k, s: jnp.ones(s, self.param_dtype), shape)
            bias = self.param("bias",
                              lambda k, s: jnp.zeros(s, self.param_dtype), shape)
            y = y * weight + bias
        return y


class BatchNorm(nn.Module):
    """torch.nn.BatchNormNd parity for channel-last inputs."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    track_running_stats: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feat_shape = (self.num_features,)
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), feat_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), feat_shape
        )

        use_batch_stats = train or not self.track_running_stats
        if use_batch_stats:
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.var(x, axis=reduce_axes)  # biased, used for normalization
            if train and self.track_running_stats and not self.is_initializing():
                n = x.size / self.num_features
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            weight = self.param(
                "weight", lambda k, s: jnp.ones(s, self.param_dtype), feat_shape)
            bias = self.param(
                "bias", lambda k, s: jnp.zeros(s, self.param_dtype), feat_shape)
            y = y * weight + bias
        return y


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm parity over the last dimension."""

    num_features: int
    eps: float = 1e-5
    elementwise_affine: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.elementwise_affine:
            weight = self.param(
                "weight", lambda k, s: jnp.ones(s, self.param_dtype),
                (self.num_features,))
            bias = self.param(
                "bias", lambda k, s: jnp.zeros(s, self.param_dtype),
                (self.num_features,))
            y = y * weight + bias
        return y


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm parity for channel-last inputs.

    Reference usage passes num_channels positionally as the first ctor arg of
    the norm class; our factories map that onto `num_features` and default
    num_groups to the reference's norm_kwargs (or 1)."""

    num_features: int
    num_groups: int = 1
    eps: float = 1e-5
    affine: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        g = self.num_groups
        c = self.num_features
        assert c % g == 0
        shape = x.shape
        xg = x.reshape(shape[:-1] + (g, c // g))
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        y = ((xg - mean) / jnp.sqrt(var + self.eps)).reshape(shape)
        if self.affine:
            weight = self.param(
                "weight", lambda k, s: jnp.ones(s, self.param_dtype), (c,))
            bias = self.param(
                "bias", lambda k, s: jnp.zeros(s, self.param_dtype), (c,))
            y = y * weight + bias
        return y


class RMSNorm(nn.Module):
    """torch.nn.RMSNorm parity (weight-only affine, last-dim normalization)."""

    num_features: int
    eps: Optional[float] = None
    elementwise_affine: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        eps = self.eps if self.eps is not None else jnp.finfo(x.dtype).eps
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        y = x / jnp.sqrt(ms + eps)
        if self.elementwise_affine:
            weight = self.param(
                "weight", lambda k, s: jnp.ones(s, self.param_dtype),
                (self.num_features,))
            y = y * weight
        return y


class Identity(nn.Module):
    num_features: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        return x


# CLI-name registry (train.py:24-30).  "InstanceNorm2d"/"BatchNorm2d" names
# are kept even though our modules are rank-agnostic (channel-last).
NORM_LAYERS: dict[str, Any] = {
    "BatchNorm1d": BatchNorm,
    "BatchNorm2d": BatchNorm,
    "BatchNorm3d": BatchNorm,
    "InstanceNorm1d": InstanceNorm,
    "InstanceNorm2d": InstanceNorm,
    "InstanceNorm3d": InstanceNorm,
    "GroupNorm": GroupNorm,
    "LayerNorm": LayerNorm,
    "RMSNorm": RMSNorm,
    "None": None,
    "Identity": Identity,
}


def resolve_norm(norm) -> Optional[Callable]:
    """Accept a module class, a registry name, or None."""
    if norm is None:
        return None
    if isinstance(norm, str):
        return NORM_LAYERS[norm]
    return norm


def make_norm(norm, num_features: int, name: str = None, **norm_kwargs):
    """Instantiate a norm class with signature-filtered kwargs, mirroring the
    reference's `inspect.signature` filtering (layers/kan_layers.py:178-181).

    The reference also maps its `affine` flag onto whichever of
    affine/elementwise_affine the norm supports.  `name` pins the flax scope
    (used where a layer holds several instances, e.g. per-group norms)."""
    cls = resolve_norm(norm)
    if cls is None:
        return Identity(num_features=num_features, name=name)
    valid = inspect.signature(cls).parameters
    kwargs = {}
    for k, v in norm_kwargs.items():
        if k in valid:
            kwargs[k] = v
        elif k == "affine" and "elementwise_affine" in valid:
            kwargs["elementwise_affine"] = v
    return cls(num_features=num_features, name=name, **kwargs)
