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
