"""BatchNorm folding (utils/fold_bn.py) — exact-semantics parity.

The transform must leave every eval-mode forward numerically unchanged
(up to the f32 roundoff of scaling the kernels) on every recognized
pattern, and must leave unrecognized structures bit-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.nn.kan_conv import KanConvND
from convkan_tpu.ops.std_conv import StdConvBlock
from convkan_tpu.utils.fold_bn import fold_batch_norms


def _warm_stats(model, variables, x, steps=3, **apply_kw):
    """Run a few train-mode steps so running mean/var are non-trivial."""
    for i in range(steps):
        key = jax.random.PRNGKey(100 + i)
        xi = x + 0.3 * jax.random.normal(key, x.shape, x.dtype)
        _, mut = model.apply(variables, xi, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key}, **apply_kw)
        variables = {**variables, "batch_stats": mut["batch_stats"]}
    return variables


@pytest.mark.parametrize("affine", [True, False])
def test_fold_std_conv_block(affine):
    m = StdConvBlock(in_planes=6, out_planes=16, kernel_size=3, stride=1,
                     padding=1, base_activation="relu",
                     norm_layer="BatchNorm2d",
                     norm_kwargs={"affine": affine})
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    v = _warm_stats(m, v, x)
    y0 = m.apply(v, x, train=False)
    vf, n = fold_batch_norms(v)
    assert n == 1
    yf = m.apply(vf, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)
    # the folded BN is a pure shift: weight 1, unit-sqrt variance
    bn = [k for k in vf["batch_stats"].keys()][0]
    var = np.asarray(vf["batch_stats"][bn]["var"], np.float32)
    assert (np.float32(var + np.float32(1e-5)) == np.float32(1.0)).all()


def test_fold_kan_conv_output_bn():
    """KanConvND with a BatchNorm output norm: scale folds into BOTH
    poly_w and base_w (spline_out + base_out are each linear in their
    weights)."""
    m = KanConvND(family="kan", input_dim=6, output_dim=16, kernel_size=3,
                  ndim=2, padding=1, grid_size=5, spline_order=3,
                  norm_layer="BatchNorm2d")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    v = _warm_stats(m, v, x)
    y0 = m.apply(v, x, train=False)
    vf, n = fold_batch_norms(v)
    assert n == 1
    assert not np.allclose(np.asarray(vf["params"]["poly_w"]),
                           np.asarray(v["params"]["poly_w"]))
    yf = m.apply(vf, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)


def test_fastkan_input_norm_skipped():
    """FastKAN's per-group input BatchNorms are input-side normalizations
    (not foldable into a preceding conv) and must be left untouched."""
    m = KanConvND(family="fastkan", input_dim=6, output_dim=8,
                  kernel_size=3, ndim=2, padding=1, grid_size=8,
                  norm_layer="BatchNorm2d")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    v = _warm_stats(m, v, x)
    y0 = m.apply(v, x, train=False)
    vf, n = fold_batch_norms(v)
    # fastkan has norm_on='input' only — nothing to fold, nothing touched
    assert n == 0
    for k in v["batch_stats"]:
        for leaf in ("mean", "var"):
            np.testing.assert_array_equal(
                np.asarray(vf["batch_stats"][k][leaf]),
                np.asarray(v["batch_stats"][k][leaf]))
    yf = m.apply(vf, x, train=False)
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(y0))


def test_no_batch_stats_noop():
    m = KanConvND(family="kan", input_dim=3, output_dim=4, kernel_size=3,
                  ndim=2, padding=1, grid_size=5, spline_order=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    vf, n = fold_batch_norms(v)
    assert n == 0 and vf is v


@pytest.mark.slow
def test_fold_mobilenetv3_small_whole_model():
    """Whole-model fold: every std conv block's BN (eps=0.001) folds and
    the eval forward is unchanged."""
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    m = mobilenet_v3_kan("small", 10, conv_type="conv")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3),
                          jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    v = _warm_stats(m, v, x, steps=2)
    y0 = m.apply(v, x, train=False)
    vf, n = fold_batch_norms(v, eps=1e-3)
    assert n >= 30, f"expected every ConvBN to fold, got {n}"
    yf = m.apply(vf, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_export_fold_bn_roundtrip():
    """export_forward(fold_bn=True) serves the same logits."""
    from convkan_tpu.utils.export import export_forward, load_forward
    m = StdConvBlock(in_planes=3, out_planes=8, kernel_size=3, stride=1,
                     padding=1, base_activation="relu",
                     norm_layer="BatchNorm2d")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=True)
    v = _warm_stats(m, v, x)
    x = x[:1]
    y0 = np.asarray(m.apply(v, x, train=False))
    blob = export_forward(m, v, (8, 8, 3), batch_poly=False, fold_bn=True)
    yf = np.asarray(load_forward(blob)(x))
    np.testing.assert_allclose(yf, y0, atol=1e-5, rtol=1e-5)
