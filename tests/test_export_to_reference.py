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


def _reference_mnv3():
    sys.path.insert(0, TOOLS)
    sys.path.insert(0, REFERENCE)
    try:
        import tv_stub  # noqa: F401  (torchvision SqueezeExcitation stub)
        from models.kan_mobilenetv3 import MobileNetV3KAN
    finally:
        sys.path.remove(TOOLS)
        sys.path.remove(REFERENCE)
    return MobileNetV3KAN


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
