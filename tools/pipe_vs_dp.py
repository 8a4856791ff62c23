"""Measured DP-vs-pipeline comparison for the heterogeneous GPipe VGG
(VERDICT r3 #5's 'compare against DP at equal device count').

Runs on the 8-virtual-device CPU mesh (the only multi-device substrate on
this host — one real TPU chip).  CPU wall-clock is NOT TPU wall-clock,
but the structural verdict (bubble fraction + replicated-vs-sharded
compute) transfers: GPipe runs each microbatch through S sequential
stage programs with a (S-1)/(M+S-1) bubble and per-stage backward
recompute, while DP runs the whole model once per shard with a gradient
psum.  For a model that FITS on one device (every model in this zoo),
DP does strictly less work per device — pipelining is the lever for
models whose ACTIVATIONS/params exceed a single device, which is why it
ships as an option rather than a default.

Usage: python tools/pipe_vs_dp.py [--steps 6] [--batch 64]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def run(model, mesh, batch, steps, tag):
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    x0 = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    xb = np.random.RandomState(0).randint(0, 256, (batch, 32, 32, 3),
                                          np.uint8)
    yb = np.random.RandomState(1).randint(0, 10, (batch,), np.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=4)
    step = make_train_step(model, "CIFAR10", augment=False, mesh=mesh)
    state, loss = step(state, jax.random.PRNGKey(7), xb, yb)  # compile
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(steps):
        state, loss = step(state, jax.random.PRNGKey(7), xb, yb)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / steps
    print(f"{tag}: {dt * 1e3:.1f} ms/step, {batch / dt:.1f} img/s "
          f"(loss {float(loss):.4f})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from convkan_tpu.models.vgg import PipelinedVGGKAN, vggkan
    from convkan_tpu.parallel.mesh import make_mesh
    from convkan_tpu.parallel.pipeline import make_pipeline_mesh

    kw = dict(kan_conv="ChebyKAN", classifier_type="Linear",
              dropout_linear=0.0, arch="VGG16_kansmall")

    dp = run(vggkan(3, 10, **kw), make_mesh(data=8), args.batch,
             args.steps, "DP data=8")
    pmesh = make_pipeline_mesh(pipe=4, data=2)
    pp = run(PipelinedVGGKAN(3, 10, mesh=pmesh, **kw), pmesh, args.batch,
             args.steps, "GPipe pipe=4 x data=2")
    print(f"DP/GPipe step-time ratio: {pp / dp:.2f}x "
          f"(>1 means DP faster at equal devices)")


if __name__ == "__main__":
    main()
