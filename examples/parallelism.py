"""Tour of convkan_tpu's parallelism axes on a virtual 8-device CPU mesh.

    python examples/parallelism.py

The reference is single-device (SURVEY.md §2.5); every axis here is a
new TPU-first component.  On real hardware drop the JAX_PLATFORMS /
device-count overrides — the same code runs over TPU ICI, and
`make_multislice_mesh` adds a DCN axis across slices.

Covers:
  1. data parallelism        — batch sharded over 'data', gradients
                               all-reduced by XLA collectives;
  2. tensor parallelism      — conv/linear output channels (and optimizer
                               moments) sharded over 'model';
  3. spatial sharding        — image planes sharded with ppermute halo
                               exchange (1/2/3-D, multi-axis), for inputs
                               too large for one chip;
  4. whole-model spatial     — a process default shards every conv of an
                               already-built model;
  5. multi-slice meshes      — a leading 'dcn' axis for cross-slice
                               gradient sync;
  6. ZeRO-1                  — AdamW moments sharded over 'data', params
                               replicated (reduce-scatter/all-gather by
                               XLA);
  7. FSDP (ZeRO-3)           — params AND moments sharded over 'data';
                               XLA all-gathers weights at their use sites
                               and reduce-scatters gradients;
  8. pipeline parallelism    — a deep KAN-MLP trunk's stacked stages over
                               a 'pipe' axis, GPipe scan+ppermute;
  9. expert parallelism      — a mixture-of-KAN-experts layer, top-1
                               routed, experts sharded over 'expert'.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# virtual 8-device CPU mesh by default — the demo needs 8 devices, which
# single-chip hosts don't have.  Set CONVKAN_EXAMPLE_REAL_DEVICES=1 on a
# real multi-chip slice to run it over the actual TPUs instead.  Must run
# before the backend initializes, i.e. before any jax.devices() call.
import jax

if not os.environ.get("CONVKAN_EXAMPLE_REAL_DEVICES"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from convkan_tpu.models import vggkan
from convkan_tpu.nn.kan_conv import KanConvND
from convkan_tpu.parallel.mesh import make_mesh, make_multislice_mesh
from convkan_tpu.parallel.sharding import state_shardings
from convkan_tpu.train.loop import make_eval_step, make_train_step
from convkan_tpu.train.state import create_train_state


def data_parallel():
    """Pure DP: params replicated, batch sharded over all 8 devices."""
    mesh = make_mesh(data=8)
    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="KAN",
                   classifier_type="Linear", width_scale=0.25)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=10)
    step = make_train_step(model, "CIFAR10", augment=True, mesh=mesh)
    xb = np.random.RandomState(0).randint(0, 256, (16, 32, 32, 3), np.uint8)
    yb = np.random.RandomState(1).randint(0, 10, (16,), np.int32)
    state, loss = step(state, jax.random.PRNGKey(1), xb, yb)
    print(f"1. data parallel (8-way):        loss {float(loss):.4f}")
    return model, state


def tensor_parallel(model):
    """dp=2 x tp=4: output channels of every conv/linear (and the AdamW
    moments) shard over 'model'; XLA inserts the ICI collectives."""
    mesh = make_mesh(data=2, model=4)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=10)
    st_sh = state_shardings(state, mesh)
    state = jax.device_put(state, st_sh)
    step = make_train_step(model, "CIFAR10", augment=True, mesh=mesh,
                           state_shardings=st_sh)
    xb = np.random.RandomState(0).randint(0, 256, (16, 32, 32, 3), np.uint8)
    yb = np.random.RandomState(1).randint(0, 10, (16,), np.int32)
    state, loss = step(state, jax.random.PRNGKey(1), xb, yb)
    ev = make_eval_step(model, "CIFAR10", 10, mesh=mesh,
                        state_shardings=st_sh)
    ls, _cm = ev(state, xb, yb, np.ones((16,), np.float32))
    print(f"2. tensor parallel (2x4):        loss {float(loss):.4f}, "
          f"eval loss {float(ls) / 16:.4f}")


def spatial_sharding():
    """One 64x32 image plane split over a 4x2 (H x W) mesh; each conv
    exchanges halo rows/cols with its neighbors via ppermute."""
    mesh = make_mesh(data=4, model=2)  # reuse axes as (H, W) spatial
    layer = KanConvND(family="kan", input_dim=3, output_dim=8,
                      kernel_size=3, ndim=2, padding=1,
                      spatial_mesh=mesh, spatial_axis=("data", "model"))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32, 3), jnp.float32)
    v = layer.init(jax.random.PRNGKey(1), x, train=False)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", "model", None)))
    y = jax.jit(lambda v, x: layer.apply(v, x, train=False))(v, xs)
    # reference result without sharding
    y_ref = KanConvND(family="kan", input_dim=3, output_dim=8, kernel_size=3,
                      ndim=2, padding=1).apply(v, x, train=False)
    err = float(jnp.max(jnp.abs(y - y_ref)))
    print(f"3. spatial halo (4x2 H x W):     max |sharded - full| = {err:.2e}")


def spatial_whole_model(model):
    """Whole-model spatial sharding: the factories keep the reference
    signatures (no spatial argument), so a process default shards every
    conv in an already-built model — KAN, WavKAN and std blocks alike."""
    from convkan_tpu.nn.kan_conv import set_spatial_defaults

    mesh = make_mesh(data=4, model=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(1), x, train=False)
    y_ref = model.apply(v, x, train=False)
    prev = set_spatial_defaults(mesh, "data")
    try:
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, "data", None, None)))
        y = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, xs)
    finally:
        set_spatial_defaults(*prev)
    err = float(jnp.max(jnp.abs(y - y_ref)))
    print(f"4. whole-model spatial default:  max |sharded - full| = {err:.2e}")


def multislice():
    """Emulated 2-slice pod: gradients all-reduce over 'dcn' (DCN on real
    pods) and 'data' (ICI within a slice)."""
    mesh = make_multislice_mesh(model=2, n_slices=2, devices=jax.devices())
    x = jnp.arange(8.0)
    xs = jax.device_put(x, NamedSharding(mesh, P(("dcn", "data"))))
    total = jax.jit(jnp.sum)(xs)
    print(f"5. multislice mesh {mesh.devices.shape} ('dcn','data','model'): "
          f"psum check {float(total):.0f} == 28")


def zero1(model):
    """ZeRO-1: optimizer moments sharded over 'data' — per-device
    optimizer memory drops ~2x param bytes; the math is unchanged."""
    mesh = make_mesh(data=8)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=10)
    st_sh = state_shardings(state, mesh, zero1=True)
    state = jax.device_put(state, st_sh)
    step = make_train_step(model, "CIFAR10", augment=True, mesh=mesh,
                           state_shardings=st_sh)
    xb = np.random.RandomState(0).randint(0, 256, (16, 32, 32, 3), np.uint8)
    yb = np.random.RandomState(1).randint(0, 10, (16,), np.int32)
    state, loss = step(state, jax.random.PRNGKey(1), xb, yb)
    leaf = next(x for x in jax.tree_util.tree_leaves(state.opt_state)
                if hasattr(x, "sharding") and any(
                    "data" in (e if isinstance(e, tuple) else (e,))
                    for e in x.sharding.spec if e))
    frac = leaf.addressable_shards[0].data.size / leaf.size
    print(f"6. ZeRO-1 over 8 devices:        loss {float(loss):.4f}, "
          f"each device holds {frac:.3f} of a moment leaf")


def fsdp(model):
    """FSDP (GSPMD ZeRO-3): params + moments sharded over 'data' —
    per-device model memory drops ~1/N; XLA all-gathers each weight at
    its use sites and reduce-scatters its gradient."""
    mesh = make_mesh(data=8)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=10)
    st_sh = state_shardings(state, mesh, fsdp=True)
    state = jax.device_put(state, st_sh)
    step = make_train_step(model, "CIFAR10", augment=True, mesh=mesh,
                           state_shardings=st_sh)
    xb = np.random.RandomState(0).randint(0, 256, (16, 32, 32, 3), np.uint8)
    yb = np.random.RandomState(1).randint(0, 10, (16,), np.int32)
    state, loss = step(state, jax.random.PRNGKey(1), xb, yb)
    leaf = next(x for x in jax.tree_util.tree_leaves(state.params)
                if hasattr(x, "sharding") and any(
                    "data" in (e if isinstance(e, tuple) else (e,))
                    for e in x.sharding.spec if e))
    frac = leaf.addressable_shards[0].data.size / leaf.size
    print(f"7. FSDP over 8 devices:          loss {float(loss):.4f}, "
          f"each device holds {frac:.3f} of a param leaf")


def pipeline_parallel():
    """GPipe: 4 identical ChebyKAN stages pipelined over a 4-wide 'pipe'
    axis (x 2 data); the sequential lax.scan trunk is the oracle."""
    from convkan_tpu.parallel.pipeline import (
        PipelinedKanMLP, make_pipeline_mesh)

    mesh = make_pipeline_mesh(pipe=4, data=2)
    kw = dict(family="ChebyKAN", in_dim=64, hidden=128, n_stages=4,
              out_dim=10)
    seq = PipelinedKanMLP(**kw)
    pip = PipelinedKanMLP(**kw, mesh=mesh)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 64))
    v = seq.init(jax.random.PRNGKey(1), x, train=False)
    y_seq = seq.apply(v, x, train=False)
    y_pip = jax.jit(lambda v, x: pip.apply(v, x, train=False))(v, x)
    err = float(jnp.max(jnp.abs(y_pip - y_seq)))
    print(f"8. pipeline (4 stages x pipe=4): max |pipelined - seq| = "
          f"{err:.2e}")


def expert_parallel():
    """GShard-style MoE: 4 ChebyKAN experts sharded over a 4-wide
    'expert' axis; the unsharded dense-dispatch run is the oracle."""
    from convkan_tpu.parallel.moe import (
        KanMoE, expert_state_shardings, make_expert_mesh)

    mesh = make_expert_mesh(expert=4, data=2)
    kw = dict(family="ChebyKAN", in_dim=64, out_dim=10, n_experts=4)
    dense, moe = KanMoE(**kw), KanMoE(**kw, mesh=mesh)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 64))
    v = dense.init(jax.random.PRNGKey(1), x, train=False)
    y_dense = dense.apply(v, x, train=False)
    params = jax.device_put(v["params"],
                            expert_state_shardings(v["params"], mesh))
    y_moe = jax.jit(
        lambda p, x: moe.apply({"params": p}, x, train=False))(params, x)
    err = float(jnp.max(jnp.abs(y_moe - y_dense)))
    print(f"9. expert parallel (4 experts):  max |sharded - dense| = "
          f"{err:.2e}")


if __name__ == "__main__":
    model, _ = data_parallel()
    tensor_parallel(model)
    spatial_sharding()
    spatial_whole_model(model)
    multislice()
    zero1(model)
    fsdp(model)
    pipeline_parallel()
    expert_parallel()
    print("done.")
