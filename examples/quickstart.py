"""End-to-end tour of convkan_tpu (runs on CPU or TPU, no dataset files).

    python examples/quickstart.py

Covers: building KAN conv/MLP layers from the factories, training a
KAN-VGG with the harness, checkpoint resume, torch-reference checkpoint
migration, and StableHLO export for serving.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from convkan_tpu.factory import CONV_KAN_FACTORY, MLP_KAN_FACTORY
from convkan_tpu.models import vggkan
from convkan_tpu.train.data import get_datasets
from convkan_tpu.train.loop import train_model_generic
from convkan_tpu.utils.export import export_forward, load_forward


def layers_demo():
    """Every reference factory key builds a working layer."""
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)  # NHWC
    layer = CONV_KAN_FACTORY["ChebyKAN"](3, 8, kernel_size=3, degree=4)
    v = layer.init(jax.random.PRNGKey(0), x, train=False)
    print("ChebyKAN conv:", layer.apply(v, x, train=False).shape)

    mlp = MLP_KAN_FACTORY["FastKAN"]([784, 64, 10])
    xm = jnp.zeros((2, 784), jnp.float32)
    vm = mlp.init(jax.random.PRNGKey(0), xm, train=False)
    print("FastKAN MLP:", mlp.apply(vm, xm, train=False).shape)


def train_demo():
    """Two epochs of KAN-VGG on synthetic CIFAR-shaped data."""
    train_ds, test_ds, classes = get_datasets("CIFAR10", synthetic=True,
                                              synthetic_size=256)
    model = vggkan(3, len(classes), arch="VGG16_kansmall", kan_conv="KAN",
                   classifier_type="Linear", width_scale=0.5)
    state, history = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", len(classes), batch_size=64,
        epochs=2, path="./results_demo", model_name="demo")
    print("history:", {k: [round(float(x), 3) for x in v]
                       for k, v in history.items() if k == "train_loss"})
    return model, state


def export_demo(model, state):
    """Serialize the trained forward to StableHLO and run it back."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    blob = export_forward(model, variables, (32, 32, 3))
    fn = load_forward(blob)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    print("exported artifact:", len(blob), "bytes; logits",
          np.asarray(fn(x)).shape)


if __name__ == "__main__":
    layers_demo()
    model, state = train_demo()
    export_demo(model, state)
    print("done")
