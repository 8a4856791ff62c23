"""PyTorch-parity initializers expressed as Flax/JAX initializers.

The reference relies on torch.nn.init (kaiming_uniform_/kaiming_normal_/
xavier_uniform_/normal_/trunc_normal_) with specific fan conventions
(e.g. layers/kan_layers.py:192-195, layers/cheby_kan_layers.py:88-90,
layers/gram_kan_layers.py:139-148).  To reproduce its init *distributions*
exactly we re-derive the same formulas for our HWIO weight layout.

Fan convention (matches torch.nn.init._calculate_fan_in_and_fan_out):
  * 2D weight (out, in):            fan_in = in, fan_out = out
  * convNd weight (out, in, *k):    fan_in = in * prod(k), fan_out = out * prod(k)

Our conv weights are HWIO `(*k, I, O)`; our linear weights are `(in, out)`
(row-vector convention, y = x @ W).  The helpers below compute fans for
those layouts so that the sampled distribution is identical to torch's for
the corresponding torch-layout tensor.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _fans_conv_hwio(shape: Sequence[int]):
    """Fans for an HWIO conv weight (*spatial, I, O)."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= int(s)
    fan_in = int(shape[-2]) * receptive
    fan_out = int(shape[-1]) * receptive
    return fan_in, fan_out


def _fans_linear_io(shape: Sequence[int]):
    """Fans for an (in, out) linear weight."""
    return int(shape[0]), int(shape[1])


def _fans_torch_layout(shape: Sequence[int]):
    """Fans for a tensor kept in torch layout (out, in, *k) — used for raw
    `poly_weights`-style parameters that we store torch-shaped."""
    receptive = 1
    for s in shape[2:]:
        receptive *= int(s)
    fan_in = int(shape[1]) * receptive
    fan_out = int(shape[0]) * receptive
    return fan_in, fan_out


_FAN_FNS = {
    "conv_hwio": _fans_conv_hwio,
    "linear_io": _fans_linear_io,
    "torch": _fans_torch_layout,
}


def _gain(nonlinearity: str, a: float | None = None) -> float:
    if nonlinearity == "linear" or nonlinearity == "conv2d":
        return 1.0
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        neg = 0.01 if a is None else a
        return math.sqrt(2.0 / (1.0 + neg**2))
    raise ValueError(f"unsupported nonlinearity {nonlinearity!r}")


def kaiming_uniform(nonlinearity: str = "linear", a: float | None = None,
                    layout: str = "conv_hwio", mode: str = "fan_in"):
    """torch.nn.init.kaiming_uniform_ parity.

    bound = sqrt(3) * gain / sqrt(fan); U(-bound, bound).
    `nonlinearity='leaky_relu', a=sqrt(5)` reproduces torch's default
    Conv/Linear reset_parameters.
    """
    fan_fn = _FAN_FNS[layout]
    g = _gain(nonlinearity, a)

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = fan_fn(shape)
        fan = fan_in if mode == "fan_in" else fan_out
        bound = math.sqrt(3.0) * g / math.sqrt(fan)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_normal(nonlinearity: str = "relu", a: float | None = None,
                   layout: str = "conv_hwio", mode: str = "fan_in"):
    """torch.nn.init.kaiming_normal_ parity: N(0, gain/sqrt(fan))."""
    fan_fn = _FAN_FNS[layout]
    g = _gain(nonlinearity, a)

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = fan_fn(shape)
        fan = fan_in if mode == "fan_in" else fan_out
        std = g / math.sqrt(fan)
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_uniform(gain: float = 1.0, layout: str = "conv_hwio"):
    """torch.nn.init.xavier_uniform_ parity: U(±gain*sqrt(6/(fan_in+fan_out)))."""
    fan_fn = _FAN_FNS[layout]

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = fan_fn(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal(mean: float = 0.0, std: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def trunc_normal(mean: float = 0.0, std: float = 1.0,
                 a: float = -2.0, b: float = 2.0):
    """torch.nn.init.trunc_normal_ parity.

    NOTE: torch truncates at absolute values [a, b] (default [-2, 2]),
    *not* at mean ± a*std.  utils/utils.py:15-16 uses std=0.1 with the
    default bounds, i.e. effectively untruncated.
    """

    def init(key, shape, dtype=jnp.float32):
        lo = (a - mean) / std
        hi = (b - mean) / std
        return mean + std * jax.random.truncated_normal(key, lo, hi, shape, dtype)

    return init


def uniform(minval: float, maxval: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=minval, maxval=maxval)

    return init


def torch_linear_bias(fan_in: int):
    """torch Linear/Conv default bias init: U(±1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return uniform(-bound, bound)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
