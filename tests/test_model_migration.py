"""Whole-model reference-checkpoint migration: load a trained reference
VGGKAN state_dict into convkan_tpu.models.VGGKAN and match its forward
end-to-end — the strongest parity test and the user migration path."""

import jax
import numpy as np
import pytest

from convkan_tpu.models import vggkan
from convkan_tpu.utils.torch_compat import convert_vggkan

from golden_utils import assert_close, load_golden, nchw_to_nhwc


def _run(name, **model_kw):
    x, y_ref, sd = load_golden(name)
    model = vggkan(3, 10, arch="VGG16_kansmall", **model_kw)
    xh = nchw_to_nhwc(x)
    # init in f32 (module param_dtype); the converted reference params are
    # f64 and drive an f64 forward
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh.astype(np.float32))
    variables = convert_vggkan(sd, model, variables)
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, xh)
    # model-level tolerance is the BASELINE 1e-5 criterion: the b-spline
    # knot vectors here come from numpy's f32 linspace, which differs from
    # torch's by 1 ulp (see grid_override in the layer-level goldens, which
    # pin it exactly); 14 layers of InstanceNorm amplify that to ~2e-6
    assert_close(np.asarray(y), y_ref, tol=1e-5, name=name)


@pytest.mark.slow
def test_vgg_kan_linear_migration():
    _run("model_vgg_kan_linear", kan_conv="KAN", classifier_type="Linear")


def test_vgg_cheby_kanhead_migration():
    _run("model_vgg_cheby_kanhead", kan_conv="ChebyKAN",
         classifier_type="KAN", kan_classifier="KAN")


def test_alexnet_state_dict_migration():
    """convert_alexnet maps the reference AlexNetKAN state-dict layout
    (features.N conv modules with Sequential pool indices skipped; named
    classifier.fc1/2/3) onto our scopes.  Numeric parity of the per-layer
    conversion itself is pinned by the conv/mlp goldens; this test checks
    the whole-model key mapping and that grafted weights drive the
    forward.  (A whole-model f64 fixture was evaluated and dropped: 250 MB
    — see tools/goldens/dump_reference.py.)"""
    import jax.numpy as jnp

    from convkan_tpu.models.alexnet import alexnet_kan
    from convkan_tpu.utils.torch_compat import convert_alexnet

    rng = np.random.RandomState(0)
    K = 8  # grid 5 + order 3
    dims = [(3, 64, 5), (64, 192, 5), (192, 384, 3), (384, 256, 3),
            (256, 256, 3)]
    feat_idx = [0, 2, 4, 5, 6]  # Sequential positions, pools interleaved
    sd = {}
    for idx, (ci, co, k) in zip(feat_idx, dims):
        sd[f"features.{idx}.base_conv.0.weight"] = rng.randn(
            co, ci, k, k).astype(np.float32) * 0.05
        sd[f"features.{idx}.spline_conv.0.weight"] = rng.randn(
            co, ci * K, k, k).astype(np.float32) * 0.05
        sd[f"features.{idx}.prelus.0.weight"] = np.full((1,), 0.25,
                                                        np.float32)
    sd["classifier.fc1.weight"] = rng.randn(1024, 9216).astype(np.float32) * 0.01
    sd["classifier.fc1.bias"] = rng.randn(1024).astype(np.float32) * 0.01
    sd["classifier.fc2.weight"] = rng.randn(1024, 1024).astype(np.float32) * 0.01
    sd["classifier.fc2.bias"] = rng.randn(1024).astype(np.float32) * 0.01
    sd["classifier.fc3.weight"] = rng.randn(10, 1024).astype(np.float32) * 0.01
    sd["classifier.fc3.bias"] = rng.randn(10).astype(np.float32) * 0.01

    model = alexnet_kan(num_classes=10, input_channels=3, arch="small",
                        kan_conv="KAN", classifier_type="Linear")
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), x)
    y_init = model.apply(variables, x, train=False)

    migrated = convert_alexnet(sd, model, variables)
    # every fc landed transposed
    np.testing.assert_array_equal(
        np.asarray(migrated["params"]["Linear_0"]["w"]),
        sd["classifier.fc1.weight"].T)
    # conv weights landed (HWIO, group-folded)
    w0 = np.asarray(migrated["params"]["KanConvND_0"]["base_w"])
    assert w0.shape == (5, 5, 3, 64)
    np.testing.assert_allclose(
        w0[..., 0, 0], sd["features.0.base_conv.0.weight"][0, 0])

    y = model.apply(migrated, x, train=False)
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.max(jnp.abs(y - y_init))) > 1e-4


def test_mnv3_small_migration():
    """Whole-model MobileNetV3KAN migration (kan_mobilenetv3.py:194-410):
    grafted reference weights + running stats reproduce the reference
    forward, covering stem/last factory convs, expand/project kanconvs,
    std depthwise blocks, SE modules, and the 2-Linear head."""
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v3

    x, y_ref, sd = load_golden("model_mnv3_small_cheby")
    model = mobilenet_v3_kan("small", num_classes=4, width_mult=0.25,
                             kan_conv="ChebyKAN", degree=3,
                             classifier_type="Linear")
    xh = nchw_to_nhwc(x)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh.astype(np.float32))
    variables = convert_mobilenet_v3(sd, model, variables)
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, xh)
    assert_close(np.asarray(y), y_ref, tol=1e-5, name="model_mnv3_small")


def test_mnv3_small_fastkan_migration():
    """Base-path family (FastKAN) MNv3: pins that kanconv layers use the
    MODEL-level activation — the reference's per-block RE/HS
    activation_layer kwarg is signature-filtered away for KAN wrappers
    (kan_mobilenetv3.py:253-271)."""
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v3

    x, y_ref, sd = load_golden("model_mnv3_small_fastkan")
    model = mobilenet_v3_kan("small", num_classes=4, width_mult=0.25,
                             kan_conv="FastKAN", classifier_type="Linear")
    xh = nchw_to_nhwc(x)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh.astype(np.float32))
    variables = convert_mobilenet_v3(sd, model, variables)
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, xh)
    assert_close(np.asarray(y), y_ref, tol=1e-5,
                 name="model_mnv3_small_fastkan")


def test_mnv2_kansmall_migration():
    """Whole-model MobileNetV2KAN migration (kan_mobilenetv2.py:169-433):
    inline inverted residuals (expand/project kanconvs + std depthwise),
    running stats, last 1x1 conv, Linear 'fc' head."""
    from convkan_tpu.models.mobilenetv2 import mobilenet_v2_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v2

    x, y_ref, sd = load_golden("model_mnv2_kansmall_bessel")
    model = mobilenet_v2_kan(num_classes=4, arch="kan_small",
                             width_mult=0.25, kan_conv="BesselKAN",
                             degree=3, classifier_type="Linear")
    xh = nchw_to_nhwc(x)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh.astype(np.float32))
    variables = convert_mobilenet_v2(sd, model, variables)
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, xh)
    assert_close(np.asarray(y), y_ref, tol=1e-5, name="model_mnv2_kansmall")


def test_mnv1_conv_migration():
    """Whole-model MobileNetV1KAN migration (kan_mobilenet.py:131-342),
    conv_type='conv' — the only layout real reference checkpoints can
    have (the reference's kanconv path crashes on in_channels/in_planes,
    see convert_mobilenet_v1)."""
    from convkan_tpu.models.mobilenet import mobilenet_v1_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v1

    x, y_ref, sd = load_golden("model_mnv1_conv")
    model = mobilenet_v1_kan(num_classes=4, width_mult=0.25,
                             conv_type="conv", classifier_type="Linear")
    xh = nchw_to_nhwc(x)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh.astype(np.float32))
    variables = convert_mobilenet_v1(sd, model, variables)
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, xh)
    assert_close(np.asarray(y), y_ref, tol=1e-5, name="model_mnv1_conv")


def test_effv2_kantiny_migration():
    """Whole-model EfficientNetV2 kan_tiny migration
    (kan_efficientnetv2.py:276-505): stem/head_conv, staged Fused-MBConv +
    MBConv blocks (expand/dw/SE/project), running stats, Linear head."""
    from convkan_tpu.models.efficientnetv2 import efficientnetv2_kan_small
    from convkan_tpu.utils.torch_compat import convert_efficientnetv2

    x, y_ref, sd = load_golden("model_effv2_kantiny_gram")
    model = efficientnetv2_kan_small(arch="kan_tiny", num_classes=4,
                                     kan_conv="GRAMKAN", degree=3,
                                     classifier_type="Linear", affine=True)
    xh = nchw_to_nhwc(x)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh.astype(np.float32))
    variables = convert_efficientnetv2(sd, model, variables)
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, xh)
    assert_close(np.asarray(y), y_ref, tol=1e-5, name="model_effv2_kantiny")
