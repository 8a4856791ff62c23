"""Learnability: models must actually LEARN a learnable task end-to-end
(gradients through basis recurrences, norms, PReLUs, the optimizer, and
the on-device augmentation are all exercised)."""

import numpy as np
import pytest

from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
from convkan_tpu.models import vggkan
from convkan_tpu.train.data import ArrayDataset
from convkan_tpu.train.loop import predict_probs, train_model_generic


def _channel_task(n, seed, hw=16):
    """Label = dominant mean channel (+ brightness boost on that channel):
    trivially learnable, immune to crop/flip augmentation."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 3, (n,)).astype(np.int32)
    x = rng.randint(0, 100, (n, hw, hw, 3)).astype(np.int32)
    for i in range(n):
        x[i, :, :, y[i]] += 120
    return x.astype(np.uint8), y


@pytest.mark.parametrize("family", ["FastKAN", "ChebyKAN"])
def test_mlp_learns_channel_task(family):
    xtr, ytr = _channel_task(512, 0)
    xte, yte = _channel_task(128, 1)
    train_ds = ArrayDataset(xtr, ytr, 3, augment=False)
    test_ds = ArrayDataset(xte, yte, 3, augment=False)
    model = MLP_KAN_FACTORY[family]([16 * 16 * 3, 32, 3])
    state, history = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", 3, batch_size=64, epochs=5,
        learning_rate=3e-3)
    assert history["accuracy"][-1] > 0.9, history["accuracy"]
    probs, targets = predict_probs(model, state, test_ds, "CIFAR10", 64)
    assert probs.shape == (128, 3)
    assert abs(float(probs.sum(axis=1).mean()) - 1.0) < 1e-5


def _band_task(n, seed, hw=32):
    """Label = vertical band containing a bright blob.  Spatially structured
    (a per-channel constant offset would be erased by the KAN convs'
    InstanceNorm, so the channel task is unlearnable for conv models)."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 3, (n,)).astype(np.int32)
    x = rng.randint(0, 80, (n, hw, hw, 3)).astype(np.int32)
    for i in range(n):
        r0 = [2, 12, 22][y[i]]
        x[i, r0:r0 + 8, 8:24, :] += 150
    return np.clip(x, 0, 255).astype(np.uint8), y

# NOTE: input must be >=32px — VGG16_kansmall has 4 pools, and at 16px the
# last conv stack sees 1x1 maps where InstanceNorm has zero variance (the
# torch reference raises there; we normalize to exact zeros).


@pytest.mark.slow
def test_kan_vgg_learns_band_task():
    xtr, ytr = _band_task(512, 0)
    xte, yte = _band_task(128, 1)
    train_ds = ArrayDataset(xtr, ytr, 3, augment=False)
    test_ds = ArrayDataset(xte, yte, 3, augment=False)
    model = vggkan(3, 3, arch="VGG16_kansmall", kan_conv="KAN",
                   classifier_type="Linear", width_scale=0.5)
    state, history = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", 3, batch_size=64, epochs=8,
        learning_rate=3e-3, gamma=0.95)
    assert max(history["accuracy"]) > 0.8, history["accuracy"]


def _shape_task(n, seed, hw=32):
    """4 classes: filled disk, square outline, X cross, diagonal stripes —
    random position/size/brightness on a noisy background.  Unlike the
    channel/band tasks this needs translation-invariant SHAPE features (a
    linear probe cannot separate it), so held-out accuracy here is a real
    generalization check — the closest offline stand-in for the blocked
    real-data validation (zero-egress host, see tests/test_real_data.py)."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 4, (n,)).astype(np.int32)
    x = rng.randint(0, 50, (n, hw, hw, 3)).astype(np.int32)
    yy, xx = np.mgrid[0:hw, 0:hw]
    for i in range(n):
        r = rng.randint(6, 11)
        cy = rng.randint(r + 1, hw - r)
        cx = rng.randint(r + 1, hw - r)
        b = rng.randint(150, 201)
        dy, dx = yy - cy, xx - cx
        if y[i] == 0:                              # filled disk
            m = (dy * dy + dx * dx) <= r * r
        elif y[i] == 1:                            # square outline
            m = (np.maximum(np.abs(dy), np.abs(dx)) <= r) & \
                ~(np.maximum(np.abs(dy), np.abs(dx)) <= r - 2)
        elif y[i] == 2:                            # X cross
            m = (np.abs(np.abs(dy) - np.abs(dx)) <= 1) & \
                (np.maximum(np.abs(dy), np.abs(dx)) <= r)
        else:                                      # diagonal stripes
            m = ((dy + dx) % 4 < 2) & \
                (np.maximum(np.abs(dy), np.abs(dx)) <= r)
        x[i][m] += b
    return np.clip(x, 0, 255).astype(np.uint8), y


@pytest.mark.slow
def test_kan_vgg_generalizes_shape_task():
    """Held-out generalization on a translation-invariant shape task,
    through the full pipeline (uint8 ingress, on-device augment, AdamW,
    eval).  TPU calibration run: [0.27, 0.26, 0.56, 0.79, 0.95, 0.98,
    0.99, 1.0, ...] — the 0.9 gate has a 4-epoch margin."""
    xtr, ytr = _shape_task(2048, 0)
    xte, yte = _shape_task(512, 1)
    train_ds = ArrayDataset(xtr, ytr, 4, augment=True)
    test_ds = ArrayDataset(xte, yte, 4, augment=False)
    model = vggkan(3, 4, arch="VGG16_kansmall", kan_conv="KAN",
                   classifier_type="Linear", width_scale=0.5)
    _, history = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", 4, batch_size=128, epochs=12,
        learning_rate=2e-3, gamma=0.9)
    assert max(history["accuracy"]) > 0.9, history["accuracy"]
