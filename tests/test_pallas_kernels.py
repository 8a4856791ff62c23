"""Fused Pallas KAN-conv kernel vs the jnp/XLA reference path.

Runs the kernel in interpreter mode on CPU (the driver's TPU bench runs it
compiled).  Checks forward parity and gradient parity (the backward is a
recompute-based custom_vjp through the reference path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.nn.kan_conv import KanConvND

FAMILIES = ["kan", "cheby", "bessel", "taylor", "jacobi", "fourier",
            "gram", "relukan"]


def _pair(family, interpret):
    kw = dict(input_dim=8, output_dim=16, kernel_size=3, ndim=2, padding=1,
              degree=3, grid_size=5 if family == "kan" else 3)
    fused = KanConvND(family=family, use_pallas=True,
                      pallas_interpret=interpret, **kw)
    plain = KanConvND(family=family, use_pallas=False, **kw)
    return fused, plain


@pytest.mark.parametrize("family", FAMILIES)
def test_fused_forward_matches_jnp(family):
    fused, plain = _pair(family, interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8), jnp.float32)
    v = plain.init(jax.random.PRNGKey(1), x, train=False)
    y_plain = plain.apply(v, x, train=False)
    y_fused = fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("family", ["kan", "cheby", "gram", "relukan"])
def test_fused_gradients_match(family):
    fused, plain = _pair(family, interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8), jnp.float32)
    v = plain.init(jax.random.PRNGKey(1), x, train=False)

    def loss(module, variables, xx):
        return jnp.sum(module.apply(variables, xx, train=False) ** 2)

    g_plain = jax.grad(loss, argnums=(1, 2))(plain, v, x)
    g_fused = jax.grad(loss, argnums=(1, 2))(fused, v, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_fused_falls_back_when_unsupported():
    # stride 2 is outside the v1 kernel's scope: must silently use jnp path
    m = KanConvND(family="cheby", input_dim=8, output_dim=16, kernel_size=3,
                  ndim=2, padding=1, stride=2, degree=3, use_pallas=True,
                  pallas_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 4, 4, 16)
