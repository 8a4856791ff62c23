"""Real-dataset training validation — armed, skips cleanly offline.

This host has zero egress, so the raw dataset files cannot be fetched
here (`python -m convkan_tpu.train.download` does it on any connected
machine — README "Getting the data").  The moment the files exist under
$CONVKAN_DATA (default ./data), this suite validates the full real-data
path end-to-end: parser → augmentation → training → accuracy.

Accuracy gate: 3 epochs of KAN-VGG16_kansmall on real CIFAR-10 must
clear 45% test accuracy (a torch-reference-comparable short-run bar;
random is 10%).  MNIST: FastKAN MLP must clear 90% in 2 epochs.
"""

import os

import pytest

DATA = os.environ.get("CONVKAN_DATA", "./data")


def _has(dataset):
    from convkan_tpu.train.data import get_datasets

    try:
        get_datasets(dataset, DATA)
        return True
    except Exception:
        return False


def _train(dataset, model, epochs, batch_size, **model_kw):
    import jax
    import jax.numpy as jnp

    from convkan_tpu.train.data import get_datasets
    from convkan_tpu.train.loop import train_and_test_models
    from convkan_tpu.train.state import create_train_state

    train_ds, test_ds, classes = get_datasets(dataset, DATA)
    h, w, c = train_ds.images.shape[1:]
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, c), jnp.float32), steps_per_epoch=100)
    _, history = train_and_test_models(
        model, state, train_ds, test_ds, dataset, len(classes),
        batch_size=batch_size, epochs=epochs)
    return history


@pytest.mark.slow
@pytest.mark.skipif(not _has("CIFAR10"),
                    reason="real CIFAR-10 files not present (zero-egress "
                           "host) — see README 'Getting the data'")
def test_real_cifar10_kan_vgg_accuracy():
    from convkan_tpu.models.vgg import vggkan

    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="KAN",
                   classifier_type="Linear")
    history = _train("CIFAR10", model, epochs=3, batch_size=256)
    best = max(history["accuracy"])
    assert best >= 0.45, f"real CIFAR-10 accuracy {best:.3f} < 0.45"


@pytest.mark.slow
@pytest.mark.skipif(not _has("MNIST"),
                    reason="real MNIST files not present (zero-egress "
                           "host) — see README 'Getting the data'")
def test_real_mnist_fastkan_mlp_accuracy():
    import flax.linen as nn

    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY

    class Flat(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = x.reshape(x.shape[0], -1)
            return MLP_KAN_FACTORY["FastKAN"]([784, 128, 64, 10])(
                x, train=train)

    history = _train("MNIST", Flat(), epochs=2, batch_size=128)
    best = max(history["accuracy"])
    assert best >= 0.90, f"real MNIST accuracy {best:.3f} < 0.90"
