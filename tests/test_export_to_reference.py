"""Load a TPU-exported state_dict into the actual reference module.

The round-trip tests (test_torch_export.py) prove bit-exactness against
committed fixture state_dicts; this test proves the real user flow in
the export direction: a freshly initialized (i.e. TPU-side) model is
exported and loaded into the reference PyTorch class with
``strict=True`` — so key/shape/dtype completeness is judged by torch
itself against the real module, not just against a dump — and the two
frameworks' f64 forwards agree at golden tolerance.

Runs the reference as a numerical oracle (same policy as
tools/goldens/dump_reference.py); skipped when the reference tree is
not mounted.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "goldens")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available")


def _reference_module(modname, attr):
    sys.path.insert(0, TOOLS)
    sys.path.insert(0, REFERENCE)
    try:
        import tv_stub  # noqa: F401  (torchvision SqueezeExcitation stub)
        import importlib

        mod = importlib.import_module(modname)
    finally:
        sys.path.remove(TOOLS)
        sys.path.remove(REFERENCE)
    return getattr(mod, attr)


def _reference_mnv3():
    return _reference_module("models.kan_mobilenetv3", "MobileNetV3KAN")


def test_exported_mnv3_loads_into_reference():
    import jax
    torch = pytest.importorskip("torch")

    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.utils.torch_export import export_mobilenet_v3_state_dict

    from golden_utils import assert_close, nchw_to_nhwc

    model = mobilenet_v3_kan("small", num_classes=4, width_mult=0.25,
                             kan_conv="ChebyKAN", degree=3,
                             classifier_type="Linear")
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 64, 64)
    xh = nchw_to_nhwc(x).astype(np.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh)
    sd = export_mobilenet_v3_state_dict(model, variables)

    MobileNetV3KAN = _reference_mnv3()
    ref = MobileNetV3KAN(arch="small", num_classes=4, width_mult=0.25,
                         kan_conv="ChebyKAN", degree=3,
                         classifier_type="Linear").double().eval()
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected

    with torch.no_grad():
        y_ref = ref(torch.as_tensor(x, dtype=torch.float64)).numpy()

    f64 = jax.tree_util.tree_map(
        lambda a: (np.asarray(a, np.float64)
                   if np.issubdtype(np.asarray(a).dtype, np.floating)
                   else np.asarray(a)),
        jax.device_get(variables))
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        f64, nchw_to_nhwc(x))
    assert_close(np.asarray(y), y_ref, tol=1e-9, name="export_to_reference")


def test_wavkan_vgg_bidirectional_with_reference():
    """WavKAN (the 18th factory key) interop, both directions, against
    the in-process reference oracle — no fixture needed:

      export: fresh TPU-init VGG-WavKAN -> state_dict ->
              reference vggkan load_state_dict(strict=True) -> f64
              forward parity at 1e-9;
      import: the reference module's own state_dict -> convert_vggkan
              (incl. BatchNorm output-norm running stats, the path the
              per-layer wavkan goldens can't reach at model level) ->
              same forward.
    """
    import jax
    torch = pytest.importorskip("torch")

    from convkan_tpu.models import vggkan
    from convkan_tpu.utils.torch_compat import convert_vggkan
    from convkan_tpu.utils.torch_export import export_vggkan_state_dict

    from golden_utils import assert_close, nchw_to_nhwc

    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="WavKAN",
                   classifier_type="Linear", kan_norm_layer="BatchNorm2d")
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 32, 32)
    xh = nchw_to_nhwc(x).astype(np.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), xh)
    sd = export_vggkan_state_dict(model, variables)

    ref_vggkan = _reference_module("models.kan_vgg", "vggkan")
    ref = ref_vggkan(input_channels=3, num_classes=10,
                     arch="VGG16_kansmall", kan_conv="WavKAN",
                     classifier_type="Linear",
                     kan_norm_layer=torch.nn.BatchNorm2d).double().eval()
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected

    with torch.no_grad():
        y_ref = ref(torch.as_tensor(x, dtype=torch.float64)).numpy()

    f64 = jax.tree_util.tree_map(
        lambda a: (np.asarray(a, np.float64)
                   if np.issubdtype(np.asarray(a).dtype, np.floating)
                   else np.asarray(a)),
        jax.device_get(variables))
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        f64, nchw_to_nhwc(x))
    assert_close(np.asarray(y), y_ref, tol=1e-9, name="wavkan_export")

    # ---- import direction: reference state_dict -> our variables
    ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    migrated = convert_vggkan(ref_sd, model, variables)
    y2 = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        migrated, nchw_to_nhwc(x))
    assert_close(np.asarray(y2), y_ref, tol=1e-9, name="wavkan_import")
