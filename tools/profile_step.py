"""Trace one jitted train step on the real TPU and attribute device time.

Usage:
    python tools/profile_step.py config4            # XLA wav path
    python tools/profile_step.py config4_pallas     # fused wav kernel
    python tools/profile_step.py config5 [--batch 64] [--remat]
    python tools/profile_step.py config3

Writes the raw trace under /tmp/convkan_trace_<name>/ and prints a table
of device-time by XLA op (grouped by source line where available) —
the methodology that found the round-2 relayout-copy wins (BENCH_NOTES).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/convkan_jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    return np.asarray(jax.device_get(x)).ravel()[:1]


def build_config4(use_pallas, island_bf16=False, batch=256):
    import flax.linen as nn

    from convkan_tpu.nn.wav_conv import WavKANConv2DLayer
    from convkan_tpu.ops.layers import Linear
    from convkan_tpu.ops.pooling import adaptive_avg_pool
    from convkan_tpu.train.metrics import cross_entropy_loss
    from convkan_tpu.train.state import create_train_state


    class WavNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            for c in (32, 64, 128):
                x = WavKANConv2DLayer(
                    x.shape[-1], c, 3, padding=1,
                    wavelet_type="mexican_hat", wav_version="fast",
                    use_pallas=use_pallas,
                    island_bf16=island_bf16 or None)(x, train=train)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = adaptive_avg_pool(x, (1, 1)).reshape(x.shape[0], -1)
            return Linear(x.shape[-1], 100)(x)

    model = WavNet()
    x0 = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=100)
    xb = jnp.asarray(np.random.RandomState(0).rand(batch, 32, 32, 3),
                     jnp.float32)
    yb = jnp.asarray(np.random.RandomState(1).randint(
        0, 100, (batch,), dtype=np.int32))

    def step(state, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, xb,
                train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return cross_entropy_loss(out, yb), mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_stats), loss

    return step, state


def build_config5(batch, remat, island=False, remat_policy=None):
    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    if island:
        from convkan_tpu.nn.kan_conv import set_perf_defaults
        set_perf_defaults(island_bf16=True)  # process-wide for this tool
    model = mobilenet_v3_kan("small", num_classes=10, kan_conv="FastKAN",
                             remat=remat, remat_policy=remat_policy)
    x0 = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=100)
    step_jit = make_train_step(model, "CIFAR10", augment=False)
    xb = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, 224, 224, 3), dtype=np.uint8))
    yb = jnp.asarray(np.random.RandomState(1).randint(
        0, 10, (batch,), dtype=np.int32))

    def step(state, rng):
        return step_jit.__wrapped__(state, rng, xb, yb)

    return step, state


def build_config1():
    """bench.py measure_kanconv_micro: KANConv2D(3->16,k3,grid5,order3)
    fwd+bwd on 16x32x32x3 — the BASELINE config-1 microbenchmark."""
    from convkan_tpu.nn.kan_conv import KANConv2DLayer

    m = KANConv2DLayer(3, 16, 3, padding=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x, train=False)

    def loss_fn(p, xx):
        return jnp.sum(m.apply(p, xx, train=False) ** 2)

    # mirror bench.py's `many` composition exactly: the scan carry is a
    # scalar perturbation (params are closed over), so the trace shows
    # what the bench actually measures
    def step(c, rng):
        g = jax.grad(loss_fn)(params, x + c)
        return c * 0.0, g["params"]["poly_w"][0, 0, 0, 0]

    return step, jnp.zeros(())


def build_config2(batch=8192):
    """bench.py measure_fastkan_mlp: FastKAN MLP [784,128,64,10] train
    step (config 2) — for the per-bucket roofline audit (VERDICT r3 #6)."""
    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
    from convkan_tpu.train.metrics import cross_entropy_loss
    from convkan_tpu.train.state import create_train_state

    model = MLP_KAN_FACTORY["FastKAN"]([784, 128, 64, 10])
    x0 = jnp.zeros((batch, 28, 28, 1), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=100)
    xb = jnp.asarray(np.random.RandomState(0).rand(batch, 28, 28, 1),
                     jnp.float32)
    yb = jnp.asarray(np.random.RandomState(1).randint(
        0, 10, (batch,), dtype=np.int32))

    def step(state, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, xb, train=True,
                              rngs={"dropout": rng})
            return cross_entropy_loss(out, yb)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return step, state


def build_config3():
    from convkan_tpu.models.vgg import vggkan
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    batch = 1024
    model = vggkan(3, 10, arch="VGG16_small", kan_conv="KAN",
                   classifier_type="Linear")
    x0 = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               x0, steps_per_epoch=100)
    step_jit = make_train_step(model, "CIFAR10", augment=True)
    xb = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, 32, 32, 3), dtype=np.uint8))
    yb = jnp.asarray(np.random.RandomState(1).randint(
        0, 10, (batch,), dtype=np.int32))

    def step(state, rng):
        return step_jit.__wrapped__(state, rng, xb, yb)

    return step, state


def parse_trace(trace_dir, steps):
    """Sum device-track event durations by op name; return rows of
    (ms_per_step, name)."""
    files = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("NO TRACE FILES under", trace_dir)
        return []
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pids: process_name metadata containing 'TPU' / 'Device'
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower() or "Chip" in nm:
                dev_pids.add(e["pid"])
    by_name = defaultdict(float)
    by_bytes = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0) / 1e3  # us -> ms
            name = e.get("name", "?")
            by_name[name] += dur
            total += dur
            # XLA annotates per-op HBM traffic; effective GB/s =
            # bytes/duration vs the chip's ~819 GB/s (v5e) peak is the
            # per-bucket roofline verdict column (BENCH_NOTES standard)
            try:
                by_bytes[name] += float(
                    (e.get("args") or {}).get("bytes_accessed", 0))
            except (TypeError, ValueError):
                pass
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    print(f"\ndevice total: {total / steps:.3f} ms/step "
          f"({len(dev_pids)} device tracks, file {os.path.basename(path)})")
    print(f"  {'ms/step':>8}  {'%':>5}  {'GB/s':>6}  op")
    for name, ms in rows[:30]:
        gbps = (by_bytes[name] / (ms * 1e-3) / 1e9) if ms > 0 else 0.0
        print(f"  {ms / steps:8.3f}  {100 * ms / total:5.1f}  "
              f"{gbps:6.0f}  {name[:86]}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["config1", "config2", "config3", "config4",
                                       "config4_island", "config4_pallas",
                                       "config5", "config5_island"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_policy", default=None)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    if args.config == "config2":
        step, state = build_config2()
    elif args.config == "config4":
        step, state = build_config4(False, batch=args.batch)
    elif args.config == "config4_island":
        step, state = build_config4(False, island_bf16=True)
    elif args.config == "config4_pallas":
        step, state = build_config4(True)
    elif args.config == "config5":
        step, state = build_config5(
            args.batch, args.remat or bool(args.remat_policy),
            remat_policy=args.remat_policy)
    elif args.config == "config5_island":
        step, state = build_config5(
            args.batch, args.remat or bool(args.remat_policy), island=True,
            remat_policy=args.remat_policy)
    elif args.config == "config1":
        step, state = build_config1()
    else:
        step, state = build_config3()

    steps = args.steps

    @jax.jit
    def scan_steps(state, rng):
        def body(s, i):
            s, loss = step(s, jax.random.fold_in(rng, i))
            return s, loss
        s, losses = jax.lax.scan(body, state, jnp.arange(steps))
        return s, losses[-1]

    rng = jax.random.PRNGKey(1)
    state, loss = scan_steps(state, rng)
    _sync(loss)  # compile + warm
    tdir = f"/tmp/convkan_trace_{args.config}"
    with jax.profiler.trace(tdir):
        state, loss = scan_steps(state, rng)
        _sync(loss)
    parse_trace(tdir, steps)


if __name__ == "__main__":
    main()
