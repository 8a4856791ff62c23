"""End-to-end tour of convkan_tpu (runs on CPU or TPU, no dataset files).

    python examples/quickstart.py

Covers: building KAN conv/MLP layers from the factories, training a
KAN-VGG with the harness, checkpoint resume, torch-reference checkpoint
migration, and StableHLO export for serving.
"""

import os
import sys
import tempfile

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
    """Two epochs of KAN-VGG on synthetic CIFAR-shaped data.  Checkpoints
    go to QUICKSTART_DIR if set, else a temp dir cleaned up on exit."""
    train_ds, test_ds, classes = get_datasets("CIFAR10", synthetic=True,
                                              synthetic_size=256)
    model = vggkan(3, len(classes), arch="VGG16_kansmall", kan_conv="KAN",
                   classifier_type="Linear", width_scale=0.5)
    with tempfile.TemporaryDirectory(prefix="convkan_quickstart_") as tmp:
        state, history = train_model_generic(
            model, train_ds, test_ds, "CIFAR10", len(classes),
            batch_size=64, epochs=2,
            path=os.environ.get("QUICKSTART_DIR") or tmp,
            model_name="demo")
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


def round2_features_demo():
    """Round-2 additions: per-layer L1, segment deactivation, spatial
    sharding, and the prefetching input pipeline."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from convkan_tpu.factory.conv_factory import CONV_KAN_FACTORY
    from convkan_tpu.nn.kan_conv import KanConvND
    from convkan_tpu.parallel.mesh import make_mesh
    from convkan_tpu.train.data import epoch_batches, prefetch_batches

    # layer-scoped L1: only this layer's params are penalized
    reg_layer = CONV_KAN_FACTORY["KAN"](3, 16, 3, l1_decay=1e-5)
    print("L1-wrapped:", type(reg_layer).__name__)

    # segment deactivation (training-only spline dropout to linear chords)
    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
    mlp = MLP_KAN_FACTORY["KAN"]([784, 64, 10], p_deactivate=0.1)
    print("segment-deactivating MLP built")

    # spatial sharding: H-plane sharded conv via halo exchange
    if len(jax.devices()) > 1:
        mesh = make_mesh()
        layer = KanConvND(family="cheby", input_dim=8, output_dim=16,
                          kernel_size=3, ndim=2, padding=1, degree=3,
                          spatial_mesh=mesh, spatial_axis="data")
        x = jnp.zeros((2, 32, 16, 8), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data")))
        v = layer.init(jax.random.PRNGKey(0), x, train=False)
        print("spatially-sharded conv:",
              layer.apply(v, xs, train=False).shape)

    # double-buffered device prefetch (order-exact)
    train_ds, _, _ = get_datasets("MNIST", synthetic=True,
                                  synthetic_size=128)
    n = sum(1 for _ in prefetch_batches(
        epoch_batches(train_ds, 32, seed=0, shuffle=True)))
    print("prefetched", n, "batches")


def serving_demo(model, state):
    """Round-3: the HTTP serving engine (bucketed, dynamically batched)
    driven programmatically; `python -m convkan_tpu.serve` is the CLI."""
    from convkan_tpu.serve import InferenceEngine

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    engine = InferenceEngine(model, variables, "CIFAR10", (32, 32, 3),
                             buckets=(1, 8))
    x = np.random.RandomState(0).randint(0, 256, (3, 32, 32, 3),
                                         dtype=np.uint8)
    print("served logits:", engine.predict(x).shape,
          "metrics:", engine.metrics())
    engine.close()


if __name__ == "__main__":
    layers_demo()
    model, state = train_demo()
    export_demo(model, state)
    serving_demo(model, state)
    round2_features_demo()
    print("done")
