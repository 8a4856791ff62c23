"""Selective-remat policies (ops/remat_policy.py, VERDICT r4 #4): the
`kan_basis` checkpoint_name tag + policy selection must not change any
value — only what autodiff saves vs recomputes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.nn.kan_conv import KANConv2DLayer
from convkan_tpu.ops.remat_policy import resolve_remat_policy


def test_policies_bitwise_equal_grads():
    """Every policy yields the same gradient as the un-rematerialized
    function — bitwise, on a single KAN conv (the tagged basis tensor
    sits inside the checkpointed region)."""
    m = KANConv2DLayer(3, 16, 3, padding=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3),
                          jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=False)

    def f(p, xx):
        return jnp.mean(m.apply(p, xx, train=False) ** 2)

    g0 = jax.jit(jax.grad(f))(v, x)
    for pol in (None, "full", "except_basis", "dots"):
        fr = jax.checkpoint(f, policy=resolve_remat_policy(pol))
        g = jax.jit(jax.grad(fr))(v, x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), g0, g)


def test_model_level_policy_trains():
    """MNv3-small with remat=True + 'except_basis' compiles and yields
    finite grads (the production composition: policy inside nn.remat
    blocks with mutable batch_stats + the FastKAN basis tag)."""
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan

    m = mobilenet_v3_kan("small", num_classes=4, kan_conv="FastKAN",
                         remat=True, remat_policy="except_basis")
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3),
                          jnp.float32) * 0.5
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = jnp.array([1, 2])

    def loss(p):
        out, _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(out), y[:, None], axis=-1))

    g = jax.jit(jax.grad(loss))(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_unknown_policy_rejected():
    with pytest.raises(ValueError, match="unknown remat_policy"):
        resolve_remat_policy("bogus")
