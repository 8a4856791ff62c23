"""Activation registry with exact PyTorch numerics.

The reference maps CLI strings to torch modules (train.py:32-42).  We expose
the same names as pure functions.  Note torch's nn.GELU defaults to the
*exact* erf formulation while jax.nn.gelu defaults to the tanh
approximation, so we pin approximate=False.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


def relu(x):
    return jax.nn.relu(x)


def leakyrelu(x):
    # torch nn.LeakyReLU default negative_slope=0.01
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def tanh(x):
    return jnp.tanh(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def hardswish(x):
    # torch nn.Hardswish: x * relu6(x+3) / 6 — identical to jax.nn.hard_swish
    return jax.nn.hard_swish(x)


def hardsigmoid(x):
    return jax.nn.hard_sigmoid(x)


def identity(x):
    return x


def prelu(x, alpha):
    """Functional PReLU; `alpha` is a learnable scalar (torch default
    num_parameters=1, init 0.25)."""
    return jnp.where(x >= 0, x, alpha * x)


# Registry with the reference CLI names (train.py:32-42).  "prelu" needs a
# learnable parameter and is instantiated inside modules; the registry entry
# exists for name parity and uses torch's init value as a constant slope when
# used as a plain function.
def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


ACTIVATIONS: dict[str, Optional[Callable]] = {
    "gelu": gelu,
    "silu": silu,
    "relu": relu,
    "relu6": relu6,
    "leakyrelu": leakyrelu,
    "tanh": tanh,
    "sigmoid": sigmoid,
    "hardswish": hardswish,
    "hardsigmoid": hardsigmoid,
    "prelu": lambda x: prelu(x, 0.25),
    "None": None,
    "identity": identity,
}


def resolve_activation(act) -> Optional[Callable]:
    """Accept a callable, a registry name, or None."""
    if act is None:
        return None
    if callable(act):
        return act
    return ACTIVATIONS[act]
