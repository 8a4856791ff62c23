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
