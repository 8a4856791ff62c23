"""Model-zoo construction + forward smoke tests (jitted, float32, tiny
inputs).  Covers all seven architectures of the reference model zoo with
both conv paths and KAN heads."""

import jax
import jax.numpy as jnp
import pytest

from convkan_tpu.models import (
    alexnet_kan, efficientnet_kan_small, efficientnetv2_kan_small,
    mobilenet_v1_kan, mobilenet_v2_kan, mobilenet_v3_kan, vggkan,
)


def _run(model, hw=32, c=3):
    x = jnp.zeros((2, hw, hw, c), jnp.float32)
    v = jax.jit(lambda r: model.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    out = jax.jit(
        lambda v, x: model.apply(v, x, train=False, mutable=["batch_stats"])
    )(v, x)[0]
    assert out.shape == (2, 10)
    return out


@pytest.mark.slow
def test_vgg_kan_head():
    m = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="FastKAN",
               classifier_type="HiddenKAN", kan_classifier="ChebyKAN",
               width_scale=0.5)
    assert "VGGKAN_HiddenKAN_CHEBYKAN_FASTKAN" in m.model_name
    _run(m)


@pytest.mark.slow
def test_alexnet_small():
    m = alexnet_kan(10, 3, arch="small", kan_conv="GRAMKAN",
                    classifier_type="KAN", kan_classifier="FastKAN")
    _run(m, hw=67)


# deliberately NOT slow-marked: one cheap model-zoo forward stays in the
# default suite so zoo regressions can't land silently (ADVICE r2)
def test_mobilenet_v1():
    m = mobilenet_v1_kan(10, input_channels=3, width_mult=0.25,
                         kan_conv="ChebyKAN", classifier_type="KAN")
    _run(m)


@pytest.mark.slow
def test_mobilenet_v1_replace_depthwise():
    m = mobilenet_v1_kan(10, input_channels=3, width_mult=0.25,
                         replace_depthwise=True)
    _run(m)


@pytest.mark.slow
def test_mobilenet_v2():
    m = mobilenet_v2_kan(10, input_channels=3, arch="kan_small",
                         width_mult=0.5, kan_conv="FastKAN",
                         classifier_type="Linear")
    _run(m)


@pytest.mark.slow
def test_mobilenet_v3():
    m = mobilenet_v3_kan("small", 10, input_channels=3, width_mult=0.5,
                         kan_conv="FastKAN", classifier_type="KAN")
    assert "MobileNetV3KAN" in m.model_name
    _run(m)


@pytest.mark.slow
def test_efficientnet_v1_small():
    m = efficientnet_kan_small(arch="b0_small", num_classes=10,
                               kan_conv="FastKAN", classifier_type="KAN")
    _run(m)


@pytest.mark.slow
def test_efficientnetv2_tiny():
    m = efficientnetv2_kan_small(arch="kan_tiny", num_classes=10,
                                 kan_conv="FastKAN",
                                 classifier_type="HiddenKAN")
    assert "EfficientNetV2Small" in m.model_name
    _run(m)


@pytest.mark.slow
def test_vgg_all_classifier_types():
    for ct in ["VGGKAN", "VGG", "Identity"]:
        m = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="FastKAN",
                   classifier_type=ct, width_scale=0.25)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        v = jax.jit(lambda r: m.init({"params": r}, x, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
        if ct == "Identity":
            assert out.ndim == 2  # raw pooled features
        else:
            assert out.shape == (1, 10)


@pytest.mark.slow
def test_std_conv_paths():
    for m in [
        vggkan(3, 10, arch="VGG16_kansmall", conv_type="conv",
               classifier_type="Linear", norm_layer="BatchNorm2d"),
        mobilenet_v2_kan(10, input_channels=3, arch="kan_small",
                         width_mult=0.25, conv_type="conv"),
    ]:
        _run(m)


# ---------------------------------------------------------- std-path parity
# conv_type='conv' activation placement, pinned behaviorally (flax
# capture_intermediates): the reference gives each model its OWN std
# activation scheme — MNv2 ReLU6 with a LINEAR projection
# (kan_mobilenetv2.py:152,234), MNv3 RE/HS with a LINEAR projection
# (kan_mobilenetv3.py:177), EffV2 applies the model activation even to
# projections (its std wrapper closes over the outer activation_layer,
# kan_efficientnetv2.py:363).  These used to be uniformly ReLU here.

def _std_intermediates(model, hw=32, seed=0):
    import numpy as np

    x = jnp.asarray(np.random.RandomState(seed).randn(2, hw, hw, 3) * 2,
                    jnp.float32)
    v = jax.jit(lambda r, xx: model.init({"params": r}, xx, train=False)
                )(jax.random.PRNGKey(0), x)
    _, mods = model.apply(v, x, train=False, capture_intermediates=True)
    flat = jax.tree_util.tree_flatten_with_path(mods["intermediates"])[0]
    out = {}
    for path, val in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        out[key] = np.asarray(val)
    return out


@pytest.mark.slow
def test_mnv2_std_activations():
    from convkan_tpu.models.mobilenetv2 import mobilenet_v2_kan

    inter = _std_intermediates(
        mobilenet_v2_kan(10, arch="kan_small", conv_type="conv"))
    # stem StdConvBlock_0: ReLU6 -> clamped to [0, 6]
    stem = inter["StdConvBlock_0/__call__/[0]"]
    assert stem.min() >= 0.0 and stem.max() <= 6.0
    # first block (t=1: dw then project): StdConvBlock_2 is the linear
    # projection -> must produce negatives
    proj = inter["StdConvBlock_2/__call__/[0]"]
    assert proj.min() < -1e-3, "MNv2 std projection must be linear"


@pytest.mark.slow
def test_mnv3_std_projection_linear():
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan

    inter = _std_intermediates(
        mobilenet_v3_kan("small", 10, conv_type="conv"), hw=64)
    # first block (RE, no expand): blocks scope _MNV3Block_0 contains the
    # depthwise StdConvBlock_0 (relu, >= 0) and the projection
    # StdConvBlock_1 (linear, negatives)
    dw = inter["_MNV3Block_0/StdConvBlock_0/__call__/[0]"]
    proj = inter["_MNV3Block_0/StdConvBlock_1/__call__/[0]"]
    assert dw.min() >= 0.0
    assert proj.min() < -1e-3, "MNv3 std projection must be linear"


@pytest.mark.slow
def test_effv2_std_projection_keeps_model_activation():
    import numpy as np

    from convkan_tpu.models.efficientnetv2 import efficientnetv2_kan_small

    inter = _std_intermediates(
        efficientnetv2_kan_small(arch="tiny", num_classes=10,
                                 conv_type="conv"))
    # EVERY std conv block output must respect SiLU's lower bound
    # (~-0.2785): the reference's std wrapper applies the model activation
    # even to MBConv projections (kan_efficientnetv2.py:363 quirk)
    blocks = {k: v for k, v in inter.items()
              if k.endswith("__call__/[0]") and len(k.split("/")) >= 3
              and k.split("/")[-3].startswith("StdConvBlock")}
    assert blocks, f"no std blocks captured: {sorted(inter)[:8]}"
    for k, v in blocks.items():
        assert np.asarray(v).min() >= -0.2785 - 1e-4, (
            f"{k}: min {np.asarray(v).min()} below SiLU bound — "
            "projection lost the model activation")


# -------- eighth-review-pass pinning: norm-kwargs plumbing + bias quirk


def test_std_factory_conv_drops_kwargs_keeps_norm_kwargs():
    """The std 'conv' factory key accepts-and-DROPS **kwargs like the
    reference's conv() (its norm is built bare, layers/kan_conv.py:71-117);
    ctor norm kwargs only arrive via the explicit norm_kwargs channel."""
    from convkan_tpu.factory.conv_factory import conv as conv_factory

    blk = conv_factory(4, 8, 3, norm_kwargs={"eps": 0.5},
                       affine=False, eps=0.25, momentum=0.9)
    assert dict(blk.norm_kwargs) == {"eps": 0.5}


def test_make_conv_factory_std_norm_kwargs_channels():
    """std_norm_kwargs reach standard blocks on BOTH paths; `affine`
    rides only the conv_type='conv' path (the kanconv-path 'conv' key
    drops it, mirroring the reference's bare norm_layer(out_planes))."""
    from convkan_tpu.models.common import make_conv_factory

    f = make_conv_factory("kanconv", "conv", norm_layer="BatchNorm2d",
                          std_norm_kwargs={"eps": 0.125}, affine=False)
    blk = f(4, 8, kernel_size=3)
    assert dict(blk.norm_kwargs) == {"eps": 0.125}

    f2 = make_conv_factory("conv", None, norm_layer="BatchNorm2d", affine=False,
                           std_norm_kwargs={"eps": 0.125, "momentum": 0.01})
    b2 = f2(4, 8, kernel_size=3)
    assert dict(b2.norm_kwargs) == {"affine": False, "eps": 0.125,
                                    "momentum": 0.01}


def test_make_conv_factory_mnv2_bias_quirk():
    """std_bias_when_not_affine replicates ConvNormActivation's
    `bias = norm_layer is None or not affine` (kan_mobilenetv2.py:47,294);
    without the flag the reference default (bias only without a norm)
    holds via use_bias=None."""
    from convkan_tpu.models.common import make_conv_factory

    mk = lambda **kw: make_conv_factory("conv", None, norm_layer="BatchNorm2d",
                                        **kw)(4, 8, kernel_size=3)
    assert mk(affine=False, std_bias_when_not_affine=True).use_bias is True
    assert mk(affine=True, std_bias_when_not_affine=True).use_bias is False
    assert mk(affine=False).use_bias is None


def test_kan_norm_layer_dead_in_mobilenets():
    """kan_norm_layer is ctor-signature parity only in MNv2/MNv3 — the
    reference overrides norm_layer on every factory call
    (kan_mobilenetv2.py:107-153, kan_mobilenetv3.py:116-320), so changing
    it must not alter the variable tree (LayerNorm would add scale/bias
    params and drop batch_stats if it were live)."""
    import jax

    from convkan_tpu.models.mobilenetv2 import mobilenet_v2_kan
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    rng = {"params": jax.random.PRNGKey(0)}

    def tree(m):
        shapes = jax.eval_shape(lambda r: m.init(r, x, train=False), rng)
        return jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), shapes)

    for mk in (
        lambda knl: mobilenet_v2_kan(10, input_channels=3, arch="kan_small",
                                     width_mult=0.5, kan_conv="FastKAN",
                                     kan_norm_layer=knl),
        lambda knl: mobilenet_v3_kan("small", 10, kan_conv="ChebyKAN",
                                     kan_norm_layer=knl),
    ):
        t_batch, t_layer = tree(mk("BatchNorm2d")), tree(mk("LayerNorm"))
        assert t_batch == t_layer
