"""Exactness of the polyphase space-to-depth stride-2 conv (ops/s2d.py)
against the plain strided conv, across kernel sizes / paddings / shapes,
plus the conv_nd knob routing and gradient agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.ops.conv import conv_nd
from convkan_tpu.ops.s2d import set_s2d_stride2


@pytest.mark.parametrize("k,p", [(3, 1), (5, 2), (3, 0), (1, 0), (7, 3)])
@pytest.mark.parametrize("hw", [(8, 8), (9, 7), (224, 224)])
def test_s2d_matches_strided_conv(k, p, hw):
    if hw == (224, 224) and k != 3:
        pytest.skip("big-image leg: one kernel size is enough")
    h, w = hw
    if h + 2 * p < k or w + 2 * p < k:
        pytest.skip("kernel larger than padded input")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, 3), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (k, k, 3, 16),
                           jnp.float32)
    y_ref = conv_nd(x, wt, ndim=2, stride=2, padding=p)
    prev = set_s2d_stride2(True)
    try:
        y = conv_nd(x, wt, ndim=2, stride=2, padding=p)
    finally:
        set_s2d_stride2(prev)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_s2d_ineligible_cases_fall_through():
    """Grouped / dilated / stride-1 / even-kernel / 1-D calls keep the
    plain path even with the knob on (results must still match the knob
    OFF bit-for-bit, since they never route through s2d)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 8),
                          jnp.float32)
    cases = [
        dict(w=(3, 3, 4, 8), groups=2, stride=2, padding=1),
        dict(w=(3, 3, 8, 8), groups=1, stride=2, padding=1, dilation=2),
        dict(w=(3, 3, 8, 8), groups=1, stride=1, padding=1),
        dict(w=(4, 4, 8, 8), groups=1, stride=2, padding=1),
    ]
    for c in cases:
        wt = jax.random.normal(jax.random.PRNGKey(1), c.pop("w"),
                               jnp.float32)
        y0 = conv_nd(x, wt, ndim=2, **c)
        prev = set_s2d_stride2(True)
        try:
            y1 = conv_nd(x, wt, ndim=2, **c)
        finally:
            set_s2d_stride2(prev)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_s2d_gradients_match():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3),
                          jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 8),
                           jnp.float32)

    def loss(w, x, on):
        prev = set_s2d_stride2(on)
        try:
            return jnp.sum(conv_nd(x, w, ndim=2, stride=2, padding=1) ** 2)
        finally:
            set_s2d_stride2(prev)

    g0 = jax.grad(loss)(wt, x, False)
    g1 = jax.grad(loss)(wt, x, True)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-4)


def test_s2d_whole_model_exact():
    """KAN-MNv3 stem territory: a FastKAN conv with stride 2 through the
    layer zoo matches with the knob on."""
    from convkan_tpu.nn.kan_conv import KanConvND

    m = KanConvND(family="fastkan", input_dim=3, output_dim=16,
                  kernel_size=3, ndim=2, padding=1, stride=2, grid_size=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3),
                          jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    y0 = m.apply(v, x, train=False)
    prev = set_s2d_stride2(True)
    try:
        y1 = m.apply(v, x, train=False)
    finally:
        set_s2d_stride2(prev)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_pad_oc_exact():
    """Output-channel lane padding (set_pad_oc) is numerics-exact and
    leaves grouped convs untouched."""
    from convkan_tpu.ops.s2d import set_pad_oc

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 6, 20),
                           jnp.float32)
    y0 = conv_nd(x, wt, ndim=2, stride=1, padding=1)
    prev = set_pad_oc(True)
    try:
        y1 = conv_nd(x, wt, ndim=2, stride=1, padding=1)
        wg = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 20),
                               jnp.float32)
        yg0 = conv_nd(x, wg, ndim=2, stride=1, padding=1, groups=2)
    finally:
        set_pad_oc(prev)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)
    yg1 = conv_nd(x, wg, ndim=2, stride=1, padding=1, groups=2)
    np.testing.assert_array_equal(np.asarray(yg0), np.asarray(yg1))
