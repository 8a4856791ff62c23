"""End-to-end checkpoint-migration CLI (python -m convkan_tpu.migrate).

import: a reference-layout state_dict file becomes an Orbax checkpoint
whose restored params drive our forward to the fixture's reference
output.  export: the checkpoint round-trips back out bit-exactly, via
both the .npz and torch .pt paths.
"""

import os

import numpy as np
import pytest

from convkan_tpu.migrate import main as migrate_main

from golden_utils import GOLDEN_DIR, assert_close, load_golden, nchw_to_nhwc

FLAGS = ["--model", "VGGKAN", "--arch", "VGG16_kansmall",
         "--kan_conv", "ChebyKAN", "--classifier_type", "KAN",
         "--kan_classifier", "KAN", "--norm_layer", "InstanceNorm2d",
         "--kan_norm_layer", "InstanceNorm2d", "--dataset", "CIFAR10"]


def test_migrate_import_export_roundtrip(tmp_path):
    src = os.path.join(GOLDEN_DIR, "model_vgg_cheby_kanhead.npz")
    x, y_ref, sd = load_golden("model_vgg_cheby_kanhead")

    # ---- import: npz state_dict -> Orbax checkpoint
    ckpt = migrate_main(["import", "--src", src,
                         "--results_dir", str(tmp_path)] + FLAGS)
    root = os.path.join(str(tmp_path), "CIFAR10", "models")
    assert os.path.dirname(ckpt) == os.path.abspath(root)

    # restored params drive the forward to the reference output (the
    # checkpoint is exactly what train.py --resume would pick up)
    import jax

    from convkan_tpu.models import vggkan
    from convkan_tpu.train.checkpoint import restore_checkpoint

    name = os.path.basename(ckpt)[:-len("_last")]
    payload = restore_checkpoint(root, name, "last")
    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="ChebyKAN",
                   classifier_type="KAN", kan_classifier="KAN")
    y = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": payload["params"]}, nchw_to_nhwc(x))
    assert_close(np.asarray(y), y_ref, tol=1e-5, name="migrate_import")

    # ---- export: checkpoint -> .npz, bit-exact vs the source fixture
    out_npz = str(tmp_path / "back.npz")
    migrate_main(["export", "--src", root, "--dest", out_npz] + FLAGS)
    back = np.load(out_npz)
    assert set(back.files) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], np.asarray(sd[k]), err_msg=k)

    # ---- export: torch .pt path
    torch = pytest.importorskip("torch")
    out_pt = str(tmp_path / "back.pt")
    migrate_main(["export", "--src", root, "--dest", out_pt] + FLAGS)
    loaded = torch.load(out_pt, map_location="cpu", weights_only=True)
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(
        loaded["features.0.poly_conv.0.weight"].numpy(),
        np.asarray(sd["features.0.poly_conv.0.weight"]))


@pytest.mark.slow
def test_migrate_import_from_torch_pt(tmp_path):
    """Import the torch-native .pt format a reference user actually saves
    (state_dict via torch.save)."""
    torch = pytest.importorskip("torch")
    _, _, sd = load_golden("model_vgg_cheby_kanhead")
    src = str(tmp_path / "ref.pt")
    torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()}, src)

    ckpt = migrate_main(["import", "--src", src, "--results_dir",
                         str(tmp_path / "pt_run")] + FLAGS)

    from convkan_tpu.train.checkpoint import restore_checkpoint

    name = os.path.basename(ckpt)[:-len("_last")]
    payload = restore_checkpoint(os.path.dirname(ckpt), name, "last")
    w = payload["params"]["KanConvND_0"]["poly_w"]
    # (*k, in*K, out) group-major HWIO from the (out, in*K, *k) torch form
    ref = np.asarray(sd["features.0.poly_conv.0.weight"])
    np.testing.assert_array_equal(
        np.asarray(w), np.transpose(ref, (2, 3, 1, 0)))
