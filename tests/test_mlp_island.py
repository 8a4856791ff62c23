"""FastKANLinear bf16 island (round 4, config-2 lever): value within bf16
tolerance of the f32 path, f32 outputs/grads, process-default shared with
the conv knob."""

import jax
import jax.numpy as jnp
import numpy as np

from convkan_tpu.nn.kan_linear import FastKANLinear


def test_fastkan_linear_island_bf16():
    m0 = FastKANLinear(16, 8)
    m1 = FastKANLinear(16, 8, island_bf16=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16), jnp.float32)
    v = m0.init(jax.random.PRNGKey(1), x)
    y0, y1 = m0.apply(v, x), m1.apply(v, x)
    assert y1.dtype == jnp.float32
    scale = float(jnp.abs(y0).max())
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=0.05 * scale)

    g = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, x) ** 2))(
        v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()


def test_fastkan_linear_island_process_default():
    from convkan_tpu.nn.kan_conv import set_perf_defaults

    assert FastKANLinear(4, 4)._island_bf16_on is False
    prev = set_perf_defaults(island_bf16=True)
    try:
        assert FastKANLinear(4, 4)._island_bf16_on is True
        assert FastKANLinear(4, 4,
                             island_bf16=False)._island_bf16_on is False
    finally:
        set_perf_defaults(**prev)
