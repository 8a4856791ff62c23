"""Auxiliary-subsystem tests: save/from_pretrained, data parsers against
generated raw files, fuzzy pooling vs the reference, regularization utils,
metrics vs sklearn-style formulas, step timer."""

import gzip
import os
import pickle
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.models import vggkan
from convkan_tpu.ops.pooling import fuzzy_pool
from convkan_tpu.train.data import get_datasets
from convkan_tpu.train.metrics import (accuracy_from_cm, confusion_matrix,
                                       macro_prf1)
from convkan_tpu.utils.hub import from_pretrained, save_pretrained
from convkan_tpu.utils.regularization import l1_penalty, noise_injection

from golden_utils import nchw_to_nhwc


@pytest.mark.slow
def test_save_and_from_pretrained(tmp_path):
    m = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="ChebyKAN",
               classifier_type="Linear", width_scale=0.5)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    v = jax.jit(lambda r: m.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    y0 = m.apply(v, x, train=False)
    save_pretrained(m, v, str(tmp_path / "ckpt"))
    m2, v2 = from_pretrained(str(tmp_path / "ckpt"))
    y1 = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


@pytest.mark.slow
def test_save_and_from_pretrained_efficientnet(tmp_path):
    """Exercises the MBConfig dataclass (de)serialization path."""
    from convkan_tpu.models import efficientnetv2_kan_small

    m = efficientnetv2_kan_small(arch="kan_tiny", num_classes=10,
                                 kan_conv="FastKAN")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda r: m.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    fwd = lambda mm, vv: jax.jit(  # noqa: E731
        lambda v_, x_: mm.apply(v_, x_, train=False,
                                mutable=["batch_stats"])[0])(vv, x)
    y0 = fwd(m, v)
    save_pretrained(m, v, str(tmp_path / "ck"))
    m2, v2 = from_pretrained(str(tmp_path / "ck"))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(fwd(m2, v2)),
                               atol=1e-6)


def test_mnist_parser_roundtrip(tmp_path):
    # write IDX files in the raw MNIST format and read them back
    raw = tmp_path / "MNIST" / "raw"
    os.makedirs(raw)
    rng = np.random.RandomState(0)
    for stem, n in [("train", 32), ("t10k", 16)]:
        imgs = rng.randint(0, 256, (n, 28, 28), dtype=np.uint8)
        labels = rng.randint(0, 10, (n,), dtype=np.uint8)
        with gzip.open(raw / f"{stem}-images-idx3-ubyte.gz", "wb") as f:
            f.write(b"\x00\x00\x08\x03"
                    + n.to_bytes(4, "big") + (28).to_bytes(4, "big")
                    + (28).to_bytes(4, "big") + imgs.tobytes())
        with gzip.open(raw / f"{stem}-labels-idx1-ubyte.gz", "wb") as f:
            f.write(b"\x00\x00\x08\x01" + n.to_bytes(4, "big")
                    + labels.tobytes())
    train, test, classes = get_datasets("MNIST", str(tmp_path))
    assert train.images.shape == (32, 28, 28, 1)
    assert test.images.shape == (16, 28, 28, 1)
    assert len(classes) == 10


def test_cifar_parser_roundtrip(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    os.makedirs(d)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        blob = {b"data": rng.randint(0, 256, (4, 3072), dtype=np.uint8),
                b"labels": list(rng.randint(0, 10, (4,)))}
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump(blob, f)
    blob = {b"data": rng.randint(0, 256, (4, 3072), dtype=np.uint8),
            b"labels": list(rng.randint(0, 10, (4,)))}
    with open(d / "test_batch", "wb") as f:
        pickle.dump(blob, f)
    train, test, classes = get_datasets("CIFAR10", str(tmp_path))
    assert train.images.shape == (20, 32, 32, 3)
    assert train.augment


def test_svhn_parser_roundtrip(tmp_path):
    from scipy.io import savemat

    rng = np.random.RandomState(0)
    for split, n in [("train", 12), ("test", 8)]:
        X = rng.randint(0, 256, (32, 32, 3, n), dtype=np.uint8)
        y = rng.randint(1, 11, (n, 1)).astype(np.uint8)  # SVHN labels 1..10
        savemat(tmp_path / f"{split}_32x32.mat", {"X": X, "y": y})
    train, test, classes = get_datasets("SVHN", str(tmp_path))
    assert train.images.shape == (12, 32, 32, 3)
    assert set(np.unique(train.labels)) <= set(range(10))  # 10 -> 0 remap


def test_fuzzy_pool_matches_reference_semantics():
    """Vectorized fuzzy pooling equals a direct python transcription of
    utils/fuzzy_pooling.py:23-80."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 9, 9).astype(np.float32) * 3  # NCHW like the ref
    k, s, vmax = 3, 2, 6.0
    d, c_, a, m_, r_ = vmax / 2, vmax / 4, 1.5, vmax / 2, vmax / 2
    q = r_ + vmax / 4

    def tri(v, center, width):
        return np.clip(1 - np.abs(v - center) / width, 0, None)

    B, C, H, W = x.shape
    Ho, Wo = (H - k) // s + 1, (W - k) // s + 1
    expected = np.zeros((B, C, Ho, Wo), np.float32)
    for b in range(B):
        for ch in range(C):
            for i in range(Ho):
                for j in range(Wo):
                    patch = x[b, ch, i * s:i * s + k, j * s:j * s + k].ravel()
                    mus = [tri(patch, c_, d - c_), tri(patch, m_, a),
                           tri(patch, r_, q - r_)]
                    sel = int(np.argmax([mu.sum() for mu in mus]))
                    w = mus[sel] * patch
                    den = w.sum()
                    expected[b, ch, i, j] = 0.0 if den == 0 else (
                        (w * patch).sum() / den)

    y = fuzzy_pool(jnp.asarray(nchw_to_nhwc(x)), k, s, vmax)
    got = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


def test_imagenet_preprocessing_paths():
    """--imagenet_preprocessing parity: MNIST -> 224^2 x 3ch; CIFAR ->
    resize-256 + (random crop+flip | center crop) to 224^2
    (utils/dataloader.py:26-54)."""
    from convkan_tpu.train.data import imagenet_batch, train_batch

    tr, te, _ = get_datasets("MNIST", synthetic=True, synthetic_size=32,
                             imagenet_preprocessing=True)
    y = train_batch(jax.random.PRNGKey(0), jnp.asarray(tr.images[:2]),
                    "MNIST", tr.augment, imagenet=True)
    assert y.shape == (2, 224, 224, 3)
    # grayscale replicated across channels (before per-channel normalize)
    from convkan_tpu.train.data import IMAGENET_MEAN, IMAGENET_STD
    raw0 = np.asarray(y[..., 0]) * IMAGENET_STD[0] + IMAGENET_MEAN[0]
    raw1 = np.asarray(y[..., 1]) * IMAGENET_STD[1] + IMAGENET_MEAN[1]
    np.testing.assert_allclose(raw0, raw1, atol=1e-5)

    tr2, _, _ = get_datasets("CIFAR10", synthetic=True, synthetic_size=32,
                             imagenet_preprocessing=True)
    yt = train_batch(jax.random.PRNGKey(0), jnp.asarray(tr2.images[:2]),
                     "CIFAR10", True, imagenet=True)
    ye = imagenet_batch(None, jnp.asarray(tr2.images[:2]), train=False,
                        dataset="CIFAR10")
    assert yt.shape == (2, 224, 224, 3) and ye.shape == (2, 224, 224, 3)


def test_metrics_match_formulas():
    preds = jnp.asarray([0, 1, 2, 2, 1, 0, 1])
    targets = jnp.asarray([0, 1, 1, 2, 1, 2, 0])
    cm = confusion_matrix(preds, targets, 3)
    acc = float(accuracy_from_cm(cm))
    assert abs(acc - 4 / 7) < 1e-6
    p, r, f1 = macro_prf1(cm)
    assert 0 <= float(p) <= 1 and 0 <= float(r) <= 1 and 0 <= float(f1) <= 1


@pytest.mark.slow
def test_metrics_match_sklearn():
    """On-device macro P/R/F1 == sklearn (the reference's metric source,
    evaluations.py:146-148)."""
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score)

    rng = np.random.RandomState(0)
    targets = rng.randint(0, 7, (500,))
    preds = rng.randint(0, 7, (500,))
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(targets), 7)
    p, r, f1 = macro_prf1(cm)
    assert abs(float(accuracy_from_cm(cm))
               - accuracy_score(targets, preds)) < 1e-6
    assert abs(float(p) - precision_score(targets, preds, average="macro",
                                          zero_division=0)) < 1e-6
    assert abs(float(r) - recall_score(targets, preds, average="macro",
                                       zero_division=0)) < 1e-6
    assert abs(float(f1) - f1_score(targets, preds, average="macro",
                                    zero_division=0)) < 1e-5


def test_regularization_utils():
    params = {"a": jnp.asarray([-1.0, 2.0]), "b": jnp.asarray([[3.0]])}
    assert abs(float(l1_penalty(params, 0.1)) - 0.6) < 1e-6
    assert float(l1_penalty(params, 0.1, reference_semantics=True)) == 0.0
    x = jnp.ones((4, 8, 8, 3))
    y = noise_injection(jax.random.PRNGKey(0), x, p=0.5, train=True)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y - x))) >= 0.0


# ---------------------------------------------------------------- crops
def test_batched_crop_matches_dynamic_slice():
    """The gather-based crop (TPU-fast path) is bit-exact with the naive
    per-image dynamic_slice it replaced."""
    from convkan_tpu.train.data import _batched_crop

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 32, 32, 3))
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    offs = jax.random.randint(jax.random.PRNGKey(1), (16, 2), 0, 9)
    flip = jax.random.bernoulli(jax.random.PRNGKey(2), 0.5, (16,))

    ref = jax.vmap(lambda img, o: jax.lax.dynamic_slice(
        img, (o[0], o[1], 0), (32, 32, 3)))(xp, offs)
    ref = jnp.where(flip[:, None, None, None], ref[:, :, ::-1, :], ref)
    got = _batched_crop(xp, offs, 32, 32, flip=flip)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _torchvision_get_params_np(rs, H, W, scale, ratio, n):
    """numpy oracle for torchvision RandomResizedCrop.get_params."""
    out = []
    area = H * W
    for _ in range(n):
        box = None
        for _ in range(10):
            ta = area * rs.uniform(scale[0], scale[1])
            ar = np.exp(rs.uniform(np.log(ratio[0]), np.log(ratio[1])))
            w = int(round(np.sqrt(ta * ar)))
            h = int(round(np.sqrt(ta / ar)))
            if 0 < w <= W and 0 < h <= H:
                i = rs.randint(0, H - h + 1)
                j = rs.randint(0, W - w + 1)
                box = (i, j, h, w)
                break
        if box is None:
            in_ratio = W / H
            if in_ratio < min(ratio):
                w = W; h = int(round(W / min(ratio)))
            elif in_ratio > max(ratio):
                h = H; w = int(round(H * max(ratio)))
            else:
                w, h = W, H
            box = ((H - h) // 2, (W - w) // 2, h, w)
        out.append(box)
    return np.asarray(out, np.float64)


def test_random_resized_crop_box_distribution():
    """The on-device box sampler matches torchvision's get_params
    distribution (utils/dataloader.py:44): compare mean/std of h, w and
    of the crop area fraction over 4096 samples."""
    from convkan_tpu.train.data import sample_resized_crop_boxes

    H, W, n = 256, 341, 4096
    scale, ratio = (0.08, 1.0), (3.0 / 4, 4.0 / 3)
    ours = np.asarray(sample_resized_crop_boxes(
        jax.random.PRNGKey(0), n, H, W, scale, ratio))
    ref = _torchvision_get_params_np(
        np.random.RandomState(0), H, W, scale, ratio, n)

    for col, name in [(2, "h"), (3, "w")]:
        mo, mr = ours[:, col].mean(), ref[:, col].mean()
        so, sr = ours[:, col].std(), ref[:, col].std()
        assert abs(mo - mr) < 0.05 * mr, (name, mo, mr)
        assert abs(so - sr) < 0.10 * sr, (name, so, sr)
    fo = (ours[:, 2] * ours[:, 3]) / (H * W)
    fr = (ref[:, 2] * ref[:, 3]) / (H * W)
    assert abs(fo.mean() - fr.mean()) < 0.05 * fr.mean()
    # bounds: boxes stay inside the image
    assert (ours[:, 0] >= 0).all() and (ours[:, 1] >= 0).all()
    assert (ours[:, 0] + ours[:, 2] <= H).all()
    assert (ours[:, 1] + ours[:, 3] <= W).all()


def test_random_resized_crop_full_box_is_resize():
    """With scale pinned to 1.0 and a square image, the crop box is the
    whole image and the warp must equal a plain bilinear resize."""
    from convkan_tpu.train.data import random_resized_crop

    # upscale so jax.image.resize's antialias prefilter (downscale-only)
    # doesn't kick in — the warp intentionally matches torch's
    # antialias=False kernel
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3))
    y = random_resized_crop(jax.random.PRNGKey(4), x, 32,
                            scale=(1.0, 1.0), ratio=(1.0, 1.0))
    ref = jax.image.resize(x, (4, 32, 32, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_random_resized_crop_flip():
    """flip=True output equals the horizontally-reversed flip=False one."""
    from convkan_tpu.train.data import random_resized_crop

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 48, 48, 3))
    rng = jax.random.PRNGKey(6)
    y_no = random_resized_crop(rng, x, 24, flip=jnp.zeros(2, bool))
    y_fl = random_resized_crop(rng, x, 24, flip=jnp.ones(2, bool))
    np.testing.assert_allclose(np.asarray(y_fl),
                               np.asarray(y_no[:, :, ::-1, :]),
                               atol=1e-5)


def test_random_resized_crop_torch_oracle():
    """Full parity with torchvision's crop-then-resize semantics
    (utils/dataloader.py:44 uses RandomResizedCrop, whose tensor path is
    crop + F.interpolate(bilinear, antialias=False)): for the exact boxes
    the sampler draws, our warped output must equal torch cropping the box
    FIRST and resizing after — pinning the box-edge clamp (an upscaled
    sample must never blend pixels below/right of its box)."""
    import torch
    import torch.nn.functional as F

    from convkan_tpu.train.data import (random_resized_crop,
                                        sample_resized_crop_boxes)

    B, H, W, S = 8, 40, 56, 32
    scale, ratio = (0.08, 1.0), (3.0 / 4, 4.0 / 3)
    x = np.random.RandomState(0).rand(B, H, W, 3).astype(np.float32)
    rng = jax.random.PRNGKey(7)
    y = np.asarray(random_resized_crop(rng, jnp.asarray(x), S,
                                       scale=scale, ratio=ratio))
    # reproduce the internal boxes: random_resized_crop splits rng and
    # hands the first key to the box sampler (train/data.py:315)
    r_box, _ = jax.random.split(rng)
    boxes = np.asarray(
        sample_resized_crop_boxes(r_box, B, H, W, scale, ratio))
    # default scale floor 0.08 on 40x56 draws mostly sub-32px boxes, so
    # the upscale (clamped) regime is exercised
    assert (boxes[:, 2:] < S).any(), boxes
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    for b in range(B):
        i, j, h, w = (int(v) for v in boxes[b])
        crop = xt[b:b + 1, :, i:i + h, j:j + w]
        ref = F.interpolate(crop, size=(S, S), mode="bilinear",
                            align_corners=False, antialias=False)
        np.testing.assert_allclose(
            y[b], ref[0].permute(1, 2, 0).numpy(), atol=2e-5,
            err_msg=f"sample {b} box {(i, j, h, w)}")


def test_get_datasets_rejects_unknown_name_even_synthetic():
    """A typo'd dataset name fails loudly up front instead of as an opaque
    KeyError inside the jitted train step (eighth review pass)."""
    with pytest.raises(ValueError):
        get_datasets("IMAGENET", synthetic=True)


@pytest.mark.slow
def test_per_layer_l1_wrapper():
    """l1_decay on one factory-built layer penalizes only that layer
    (VERDICT r1 #6): the sown penalty equals decay * sum|params of the
    wrapped layer|, and its gradient leaves unwrapped layers untouched."""
    import flax.linen as nn

    from convkan_tpu.factory.conv_factory import CONV_KAN_FACTORY, l1_decay_of
    from convkan_tpu.utils.regularization import L1, sown_losses_total

    wrapped = CONV_KAN_FACTORY["KAN"](4, 8, 3, l1_decay=0.1)
    plain = CONV_KAN_FACTORY["KAN"](8, 8, 3)
    assert isinstance(wrapped, L1) and l1_decay_of(wrapped) == 0.1
    assert not isinstance(plain, L1) and l1_decay_of(plain) == 0.0

    class Net(nn.Module):
        first: nn.Module
        second: nn.Module

        @nn.compact
        def __call__(self, x, train: bool = True):
            x = self.first(x, train=train)
            return self.second(x, train=train)

    net = Net(first=wrapped, second=plain)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4), jnp.float32)
    v = net.init(jax.random.PRNGKey(1), x, train=False)
    params = v["params"]
    # wrapped layer's params nest one level deeper, like the reference's
    # "module."-prefixed state dict
    assert "layer" in str(jax.tree_util.tree_structure(params))

    def penalty_only(p):
        _, mut = net.apply({"params": p}, x, train=False,
                           mutable=["losses"])
        return sown_losses_total(mut)

    pen, grads = jax.value_and_grad(penalty_only)(params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    expected = 0.1 * sum(
        float(jnp.sum(jnp.abs(leaf)))
        for path, leaf in flat if "first" in str(path))
    assert abs(float(pen) - expected) < 1e-4 * max(expected, 1.0)

    gflat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in gflat:
        if "first" not in str(path):
            assert float(jnp.max(jnp.abs(leaf))) == 0.0, path


@pytest.mark.slow
def test_train_step_consumes_sown_l1():
    """make_train_step adds the sown per-layer penalties to the loss."""
    import flax.linen as nn

    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    def build(decay):
        return MLP_KAN_FACTORY["KAN"]([784, 8, 4], l1_decay=decay)

    x0 = jnp.zeros((4, 784), jnp.float32)
    xb = jnp.zeros((4, 28, 28, 1), jnp.uint8)
    yb = jnp.zeros((4,), jnp.int32)
    losses = {}
    for decay in (0.0, 0.5):
        model = build(decay)
        state = create_train_state(model, jax.random.PRNGKey(0), x0)
        step = make_train_step(model, "MNIST", augment=False)
        _, loss = step(state, jax.random.PRNGKey(1), xb, yb)
        losses[decay] = float(loss)
    # same weights (same init seed), so the loss difference IS the penalty
    assert losses[0.5] > losses[0.0] + 1e-3


def test_segment_deactivation_chord():
    """With p_deactivate=1 every spline edge collapses to its linear
    chord: recompute base + chords by hand from the layer's own params and
    match the full output (utils/regularization.py:253-305 semantics)."""
    from convkan_tpu.basis.bspline import bspline_basis, make_bspline_grid
    from convkan_tpu.nn.kan_linear import KANLinear
    from convkan_tpu.utils.norms import LayerNorm as _LN  # noqa: F401

    din, dout, order, gs = 6, 4, 3, 5
    layer = KANLinear(input_dim=din, output_dim=dout, grid_size=gs,
                      spline_order=order, p_deactivate=1.0,
                      param_dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, din), jnp.float64)
    v = layer.init({"params": jax.random.PRNGKey(1),
                    "dropout": jax.random.PRNGKey(2)}, x, train=True)
    y = layer.apply(v, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(3)})

    p = v["params"]
    grid = np.asarray(make_bspline_grid(gs, order, (-1.0, 1.0)))
    xs, xe = grid[order], grid[-order - 1]
    w = p["spline_w"].reshape(din, -1, dout)
    ends = jnp.broadcast_to(jnp.array([[xs], [xe]], jnp.float64), (2, din))
    eb = bspline_basis(ends, grid, order)
    y_ends = jnp.einsum("eik,iko->eio", eb, w)
    a = (y_ends[1] - y_ends[0]) / (xe - xs)
    b = y_ends[0] - a * xs
    spline = jnp.sum(a[None] * x[..., None] + b[None], axis=1)
    base = jax.nn.gelu(x, approximate=False) @ p["base_w"]
    pre = base + spline
    ln = p["LayerNorm_0"]
    mu = pre.mean(-1, keepdims=True)
    var = pre.var(-1, keepdims=True)
    yn = (pre - mu) / jnp.sqrt(var + 1e-5) * ln["weight"] + ln["bias"]
    expect = jnp.where(yn >= 0, yn, p["prelu"] * yn)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                               atol=1e-10)


def test_segment_deactivation_trains():
    """p_deactivate is reachable from the factory/training path and
    gradients stay finite; eval-mode output is unaffected by the flag."""
    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 12), jnp.float32)
    m_on = MLP_KAN_FACTORY["KAN"]([12, 8, 4], p_deactivate=0.5)
    m_off = MLP_KAN_FACTORY["KAN"]([12, 8, 4])
    v = m_off.init({"params": jax.random.PRNGKey(1),
                    "dropout": jax.random.PRNGKey(2)}, x, train=True)

    def loss(params, mod):
        out = mod.apply({"params": params}, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"], m_on)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # train-mode outputs differ (some edges chord-replaced) ...
    y_on = m_on.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    y_off = m_off.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert float(jnp.max(jnp.abs(y_on - y_off))) > 1e-6
    # ... eval-mode outputs are identical (deactivation is train-only)
    np.testing.assert_allclose(
        np.asarray(m_on.apply(v, x, train=False)),
        np.asarray(m_off.apply(v, x, train=False)), atol=0)


def test_smoothness_penalty_gradient_flow():
    """smoothness_penalty is differentiable and actually reaches
    spline_w (utils/regularization.py:163-203 working equivalent)."""
    from convkan_tpu.utils.regularization import smoothness_penalty

    w = jax.random.normal(jax.random.PRNGKey(0), (6 * 8, 4), jnp.float32)

    def pen(w):
        return smoothness_penalty(w, input_dim=6, num_basis=8,
                                  lambda_smooth=0.1)

    val, g = jax.value_and_grad(pen)(w)
    assert np.isfinite(float(val))
    assert float(jnp.max(jnp.abs(g))) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_hub_network_paths_mocked(tmp_path, monkeypatch):
    """push_to_hub / hub-id from_pretrained (PyTorchModelHubMixin parity,
    kan_vgg.py:190): the upload ships a save_pretrained layout; a repo id
    resolves through snapshot_download onto the local loader.  Network is
    mocked (zero-egress host)."""
    from unittest import mock

    import huggingface_hub

    from convkan_tpu.utils import hub as hub_lib

    m = vggkan(3, 4, arch="VGG16_kansmall", kan_conv="ChebyKAN",
               classifier_type="Linear", width_scale=0.25)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    v = jax.jit(lambda r: m.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))

    uploaded = {}

    class FakeApi:
        def __init__(self, token=None):
            pass

        def create_repo(self, repo_id, private=False, exist_ok=True):
            uploaded["repo"] = repo_id

        def upload_folder(self, repo_id, folder_path, commit_message):
            # capture the exact folder contents push would ship
            assert (os.path.isfile(os.path.join(folder_path, "config.json"))
                    ), os.listdir(folder_path)
            dest = tmp_path / "hub_repo"
            shutil.copytree(folder_path, dest)
            uploaded["path"] = str(dest)
            return f"https://huggingface.co/{repo_id}"

    with mock.patch("huggingface_hub.HfApi", FakeApi):
        url = hub_lib.push_to_hub(m, v, "someone/convkan-test")
    assert uploaded["repo"] == "someone/convkan-test"
    assert url.endswith("someone/convkan-test")

    # a repo id (not a local dir) resolves via snapshot_download
    with mock.patch.object(huggingface_hub, "snapshot_download",
                           return_value=uploaded["path"]) as sd:
        m2, v2 = hub_lib.from_pretrained("someone/convkan-test")
    assert sd.called
    y0 = m.apply(v, x, train=False)
    y1 = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_missing_dataset_error_contract(tmp_path):
    """A missing-data error states the exact acquisition step (VERDICT r2
    #9: the clone-to-real-training contract)."""
    with pytest.raises(FileNotFoundError,
                       match="convkan_tpu.train.download CIFAR10"):
        get_datasets("CIFAR10", data_path=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="synthetic_data"):
        get_datasets("MNIST", data_path=str(tmp_path))


def test_downloader_offline_error(tmp_path, monkeypatch):
    """Zero-egress failure mode: the downloader says what to fetch where
    instead of a bare URLError."""
    import urllib.request

    from convkan_tpu.train import download as dl

    def boom(url, dest):
        raise OSError("no route to host")

    monkeypatch.setattr(urllib.request, "urlretrieve", boom)
    with pytest.raises(OSError, match="place it at"):
        dl.download("SVHN", str(tmp_path), quiet=True)
