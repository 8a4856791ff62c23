"""Gradient coverage: every CONV_KAN_FACTORY and MLP_KAN_FACTORY family
must produce finite, nonzero gradients through a CE loss — this exercises
the learnable basis parameters too (GRAM beta, ReLUKAN phases, WavKAN
scale/translation) and every squash/post-combine variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.factory.conv_factory import CONV_KAN_FACTORY
from convkan_tpu.nn.kan_conv import KanConvND
from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
from convkan_tpu.train.metrics import cross_entropy_loss


def _grad_stats(loss_fn, params):
    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    finite = all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    return float(loss), finite, nonzero, len(leaves)


@pytest.mark.slow
@pytest.mark.parametrize("key", sorted(CONV_KAN_FACTORY))
def test_conv_family_gradients(key):
    fn = CONV_KAN_FACTORY[key]
    layer = fn(4, 8, kernel_size=3) if key == "conv" else fn(
        4, 8, kernel_size=3, groups=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 4), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    variables = layer.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    def loss_fn(params):
        v = dict(variables)
        v["params"] = params
        out, _ = layer.apply(v, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        logits = jnp.mean(out, axis=(1, 2))[:, :4]
        return cross_entropy_loss(logits, labels)

    loss, finite, nonzero, n = _grad_stats(loss_fn, variables["params"])
    assert np.isfinite(loss)
    assert finite, f"{key}: non-finite gradients"
    assert nonzero > 0, f"{key}: all-zero gradients over {n} leaves"


@pytest.mark.parametrize("key", sorted(MLP_KAN_FACTORY))
def test_mlp_family_gradients(key):
    stack = MLP_KAN_FACTORY[key]([12, 8, 4], dropout=0.1)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 12), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    variables = stack.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    def loss_fn(params):
        v = dict(variables)
        v["params"] = params
        out, _ = stack.apply(v, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return cross_entropy_loss(out, labels)

    loss, finite, nonzero, n = _grad_stats(loss_fn, variables["params"])
    assert np.isfinite(loss)
    assert finite, f"{key}: non-finite gradients"
    assert nonzero > 0, f"{key}: all-zero gradients over {n} leaves"


@pytest.mark.parametrize("family", ["kan", "fastkan", "cheby", "legendre",
                                    "gram", "jacobi", "bernstein", "fourier",
                                    "relukan", "taylor"])
def test_train_mode_dropout_paths(family):
    """Train-mode forward+grad with dropout>0: exercises the per-family
    dropout sites and the degree-major fast path's fallback boundary
    (jacobi's basis-site dropout must fall back; others stay fast)."""
    m = KanConvND(family=family, input_dim=6, output_dim=8, kernel_size=3,
                  ndim=2, padding=1, degree=3, grid_size=5, dropout=0.25)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}, x, train=True)

    def loss(params, xx):
        out = m.apply({"params": params}, xx, train=True,
                      rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out ** 2)

    l, g = jax.value_and_grad(loss, argnums=(0, 1))(v["params"], x)
    assert np.isfinite(float(l))
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
