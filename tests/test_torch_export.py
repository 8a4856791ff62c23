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


def _roundtrip(name, **model_kw):
    _, _, sd = load_golden(name)
    model = vggkan(3, 10, arch="VGG16_kansmall", **model_kw)
    # any input of the right shape works for init; shapes come from cfg
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.PRNGKey(0), x)
    variables = convert_vggkan(sd, model, variables)

    out = export_vggkan_state_dict(model, variables)

    assert set(out) == set(sd), (
        f"key mismatch: missing {sorted(set(sd) - set(out))[:5]}, "
        f"extra {sorted(set(out) - set(sd))[:5]}")
    for k in sorted(sd):
        np.testing.assert_array_equal(out[k], np.asarray(sd[k]), err_msg=k)
        assert out[k].dtype == np.asarray(sd[k]).dtype, (
            f"{k}: {out[k].dtype} vs {np.asarray(sd[k]).dtype}")


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
