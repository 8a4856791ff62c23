"""TPU -> reference export round-trip.

`torch_compat` migrates reference checkpoints in; `torch_export` is the
inverse direction (models/kan_vgg.py:190-304 key vocabulary).  The
strongest possible check needs no torch at test time: graft a committed
reference state_dict fixture into a VGGKAN variables tree, export it
back, and require the result to be *bit-exact* and *key-complete*
against the original fixture.
"""

import jax
import numpy as np
import pytest

from convkan_tpu.models import vggkan
from convkan_tpu.utils.torch_compat import convert_vggkan
from convkan_tpu.utils.torch_export import export_vggkan_state_dict

from golden_utils import load_golden, nchw_to_nhwc


def _check(out, sd):
    assert set(out) == set(sd), (
        f"key mismatch: missing {sorted(set(sd) - set(out))[:5]}, "
        f"extra {sorted(set(out) - set(sd))[:5]}")
    for k in sorted(sd):
        ref = np.asarray(sd[k])
        assert out[k].dtype == ref.dtype, (
            f"{k}: {out[k].dtype} vs {ref.dtype}")
        if k.endswith("num_batches_tracked"):
            # the counter is not tracked on TPU and exported as 0; torch
            # only consults it when BatchNorm momentum is None (never in
            # the reference)
            continue
        np.testing.assert_array_equal(out[k], ref, err_msg=k)


def _block_roundtrip(name, build, convert, export):
    """Graft a whole-model reference fixture in, export it back, require
    key-complete bit-exactness (modulo the num_batches_tracked counter)."""
    x, _, sd = load_golden(name)
    model = build()
    xh = nchw_to_nhwc(x).astype(np.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh)
    variables = convert(sd, model, variables)
    _check(export(model, variables), sd)


def _roundtrip(name, **model_kw):
    _, _, sd = load_golden(name)
    model = vggkan(3, 10, arch="VGG16_kansmall", **model_kw)
    # any input of the right shape works for init; shapes come from cfg
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), x)
    variables = convert_vggkan(sd, model, variables)
    _check(export_vggkan_state_dict(model, variables), sd)


def test_vgg_cheby_kanhead_export_roundtrip():
    """ChebyKAN features (poly_conv ModuleLists + arange buffers) and the
    B-spline KAN classifier head (base/spline weights, prelu, layer_norm)."""
    _roundtrip("model_vgg_cheby_kanhead", kan_conv="ChebyKAN",
               classifier_type="KAN", kan_classifier="KAN")


@pytest.mark.slow
def test_vgg_kan_linear_export_roundtrip():
    """B-spline KAN features (base_conv + spline_conv + prelus) and the
    Linear classifier head."""
    _roundtrip("model_vgg_kan_linear", kan_conv="KAN",
               classifier_type="Linear")


def test_mnv3_cheby_export_roundtrip():
    """MNv3 block walk: expand/project kanconvs, std depthwise blocks,
    SE fc1/fc2, BatchNorm running stats, classifier.0/.3 Linears."""
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v3
    from convkan_tpu.utils.torch_export import export_mobilenet_v3_state_dict

    _block_roundtrip(
        "model_mnv3_small_cheby",
        lambda: mobilenet_v3_kan("small", num_classes=4, width_mult=0.25,
                                 kan_conv="ChebyKAN", degree=3,
                                 classifier_type="Linear"),
        convert_mobilenet_v3, export_mobilenet_v3_state_dict)


def test_mnv3_fastkan_export_roundtrip():
    """FastKAN quirks: spline_conv ModuleList name, per-group input-norm
    slices with running stats, reconstructed rbf.grid buffer."""
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v3
    from convkan_tpu.utils.torch_export import export_mobilenet_v3_state_dict

    _block_roundtrip(
        "model_mnv3_small_fastkan",
        lambda: mobilenet_v3_kan("small", num_classes=4, width_mult=0.25,
                                 kan_conv="FastKAN",
                                 classifier_type="Linear"),
        convert_mobilenet_v3, export_mobilenet_v3_state_dict)


@pytest.mark.slow
def test_mnv2_bessel_export_roundtrip():
    """MNv2 inline inverted residuals: features.{n}.conv.{j} prefixes,
    prelus, classifier.fc."""
    from convkan_tpu.models.mobilenetv2 import mobilenet_v2_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v2
    from convkan_tpu.utils.torch_export import export_mobilenet_v2_state_dict

    _block_roundtrip(
        "model_mnv2_kansmall_bessel",
        lambda: mobilenet_v2_kan(num_classes=4, arch="kan_small",
                                 width_mult=0.25, kan_conv="BesselKAN",
                                 degree=3, classifier_type="Linear"),
        convert_mobilenet_v2, export_mobilenet_v2_state_dict)


@pytest.mark.slow
def test_mnv1_conv_export_roundtrip():
    """MNv1 conv-type layout: std-conv stem + depthwise/pointwise blocks
    (conv weight + BN params/stats), classifier.1."""
    from convkan_tpu.models.mobilenet import mobilenet_v1_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v1
    from convkan_tpu.utils.torch_export import export_mobilenet_v1_state_dict

    _block_roundtrip(
        "model_mnv1_conv",
        lambda: mobilenet_v1_kan(num_classes=4, width_mult=0.25,
                                 conv_type="conv",
                                 classifier_type="Linear"),
        convert_mobilenet_v1, export_mobilenet_v1_state_dict)


def test_alexnet_export_roundtrip():
    """AlexNet features Sequential indices (pools interleaved at fixed
    positions) + named fc1/fc2/fc3 classifier.  No committed fixture (the
    f64 dump is 250 MB — see migration test), so the reference-layout
    state_dict is synthesized exactly as in
    test_alexnet_state_dict_migration."""
    from convkan_tpu.models.alexnet import alexnet_kan
    from convkan_tpu.utils.torch_compat import convert_alexnet
    from convkan_tpu.utils.torch_export import export_alexnet_state_dict

    rng = np.random.RandomState(0)
    K = 8  # grid 5 + order 3
    dims = [(3, 64, 5), (64, 192, 5), (192, 384, 3), (384, 256, 3),
            (256, 256, 3)]
    sd = {}
    for idx, (ci, co, k) in zip((0, 2, 4, 5, 6), dims):
        sd[f"features.{idx}.base_conv.0.weight"] = rng.randn(
            co, ci, k, k).astype(np.float32) * 0.05
        sd[f"features.{idx}.spline_conv.0.weight"] = rng.randn(
            co, ci * K, k, k).astype(np.float32) * 0.05
        sd[f"features.{idx}.prelus.0.weight"] = np.full((1,), 0.25,
                                                        np.float32)
        sd[f"features.{idx}.layer_norm.0.weight"] = (
            1 + 0.1 * rng.randn(co).astype(np.float32))
        sd[f"features.{idx}.layer_norm.0.bias"] = (
            0.1 * rng.randn(co).astype(np.float32))
    for fc, (i, o) in (("fc1", (9216, 1024)), ("fc2", (1024, 1024)),
                       ("fc3", (1024, 10))):
        sd[f"classifier.{fc}.weight"] = rng.randn(o, i).astype(
            np.float32) * 0.01
        sd[f"classifier.{fc}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    model = alexnet_kan(num_classes=10, input_channels=3, arch="small",
                        kan_conv="KAN", classifier_type="Linear")
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), x)
    variables = convert_alexnet(sd, model, variables)
    _check(export_alexnet_state_dict(model, variables), sd)


def test_effv2_gram_export_roundtrip():
    """EffV2 staged blocks (fused + mbconv, SE) and the 5-D poly_weights
    export form of the raw-weight families (GRAM beta_weights too)."""
    from convkan_tpu.models.efficientnetv2 import efficientnetv2_kan_small
    from convkan_tpu.utils.torch_compat import convert_efficientnetv2
    from convkan_tpu.utils.torch_export import (
        export_efficientnetv2_state_dict)

    _block_roundtrip(
        "model_effv2_kantiny_gram",
        lambda: efficientnetv2_kan_small(arch="kan_tiny", num_classes=4,
                                         kan_conv="GRAMKAN", degree=3,
                                         classifier_type="Linear",
                                         affine=True),
        convert_efficientnetv2, export_efficientnetv2_state_dict)


@pytest.mark.parametrize("ver", ["base", "fast", "fast_plus_one"])
def test_wavkan_conv_export_roundtrip(ver):
    """All three reference WavKAN engine layouts (wav_kan_layers.py:113-338:
    per-o conv list / grouped flat conv / (d+1)-dim conv) export back
    bit-exactly from grafted layer fixtures, incl. scale/translation
    shapes and per-group BatchNorm running stats."""
    import jax.numpy as jnp

    from convkan_tpu.nn.wav_conv import WavKANConvND
    from convkan_tpu.utils.torch_compat import (_convert_group_norms,
                                                convert_wavkan_conv)
    from convkan_tpu.utils.torch_export import export_wavkan_conv_state_dict

    from golden_utils import graft, load_golden

    x, _, sd = load_golden(f"conv2d_wavkan_{ver}_g2")
    module = WavKANConvND(input_dim=6, output_dim=8, kernel_size=3, ndim=2,
                          padding=1, groups=2, wav_version=ver,
                          wavelet_type="mexican_hat",
                          param_dtype=jnp.float64)
    xh = nchw_to_nhwc(x)
    variables = module.init(jax.random.PRNGKey(0), xh, train=False)
    converted = convert_wavkan_conv(sd, groups=2, wav_version=ver)
    np_, ns_ = _convert_group_norms(sd, "layer_norm", 2)
    if np_:
        converted["__norm_params__"] = np_
    if ns_:
        converted["__norm_stats__"] = ns_
    variables = graft(variables, converted, norm_scope="BatchNorm_0")
    out = export_wavkan_conv_state_dict(
        variables["params"], groups=2, wav_version=ver,
        stats=variables.get("batch_stats", {}))
    _check(out, sd)


def _fwd(model, variables, x):
    return np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables, x))


def test_mnv2_kan_head_migrates_both_ways():
    """MobileNetV2 with the KAN classifier head: export emits the
    classifier.fc.layers.* keys and import grafts them back — the head
    used to be silently skipped in BOTH directions, leaving it at random
    init with no diagnostic."""
    from convkan_tpu.models.mobilenetv2 import mobilenet_v2_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v2
    from convkan_tpu.utils.torch_export import export_mobilenet_v2_state_dict

    model = mobilenet_v2_kan(10, arch="kan_small", kan_conv="KAN",
                             classifier_type="KAN")
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    v1 = jax.jit(lambda r, xx: model.init({"params": r}, xx, train=False)
                 )(jax.random.PRNGKey(0), x)
    sd = export_mobilenet_v2_state_dict(model, v1)
    assert any(k.startswith("classifier.fc.layers.0.") for k in sd), (
        "KAN head missing from the exported state_dict")
    # graft into a DIFFERENT init: forward must match the source exactly
    v2 = jax.jit(lambda r, xx: model.init({"params": r}, xx, train=False)
                 )(jax.random.PRNGKey(1), x)
    assert np.abs(_fwd(model, v1, x) - _fwd(model, v2, x)).max() > 1e-6
    v2m = convert_mobilenet_v2(sd, model, v2)
    np.testing.assert_allclose(_fwd(model, v2m, x), _fwd(model, v1, x),
                               rtol=1e-6, atol=1e-6)


def test_mnv3_remat_scopes_migrate_both_ways():
    """MobileNetV3 built with remat=True scopes its blocks
    Checkpoint_MNV3Block_{i}; both converter and exporter must resolve
    that naming (they used to KeyError on _MNV3Block_{i})."""
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.utils.torch_compat import convert_mobilenet_v3
    from convkan_tpu.utils.torch_export import export_mobilenet_v3_state_dict

    model = mobilenet_v3_kan("small", 10, kan_conv="KAN", remat=True)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    v1 = jax.jit(lambda r, xx: model.init({"params": r}, xx, train=False)
                 )(jax.random.PRNGKey(0), x)
    sd = export_mobilenet_v3_state_dict(model, v1)
    v2 = jax.jit(lambda r, xx: model.init({"params": r}, xx, train=False)
                 )(jax.random.PRNGKey(1), x)
    v2m = convert_mobilenet_v3(sd, model, v2)
    np.testing.assert_allclose(_fwd(model, v2m, x), _fwd(model, v1, x),
                               rtol=1e-6, atol=1e-6)
