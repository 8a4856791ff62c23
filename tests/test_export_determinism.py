"""Serving export (StableHLO round-trip) and bitwise training determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
from convkan_tpu.models import vggkan
from convkan_tpu.train.data import get_datasets
from convkan_tpu.train.loop import train_model_generic
from convkan_tpu.utils.export import export_forward, load_forward


@pytest.mark.slow
def test_stablehlo_export_roundtrip():
    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="ChebyKAN",
                   classifier_type="Linear", width_scale=0.25)
    x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda r: model.init({"params": r}, x0, train=False))(
        jax.random.PRNGKey(0))
    blob = export_forward(model, v, (32, 32, 3))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = load_forward(bytes(blob))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    y_direct = model.apply(v, x, train=False)
    y_exported = fn(x)
    np.testing.assert_allclose(np.asarray(y_exported), np.asarray(y_direct),
                               atol=1e-6, rtol=1e-6)
    # symbolic batch: a different batch size works on the same artifact
    x3 = jax.random.normal(jax.random.PRNGKey(2), (3, 32, 32, 3), jnp.float32)
    assert np.asarray(fn(x3)).shape == (3, 10)


def test_training_is_deterministic():
    """Same seed -> bitwise-identical history (fixed PRNG streams, no
    nondeterministic host state in the step)."""
    train_ds, test_ds, _ = get_datasets("MNIST", synthetic=True,
                                        synthetic_size=192)

    def run():
        model = MLP_KAN_FACTORY["FastKAN"]([784, 32, 10])
        _, h = train_model_generic(model, train_ds, test_ds, "MNIST", 10,
                                   batch_size=64, epochs=2, seed=123)
        return h

    h1, h2 = run(), run()
    assert h1["train_loss"] == h2["train_loss"]
    assert h1["test_loss"] == h2["test_loss"]
    assert h1["accuracy"] == h2["accuracy"]
