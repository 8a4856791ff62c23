"""Benchmark: KAN-VGG CIFAR-10 training throughput (images/sec/chip).

Prints ONE JSON line with the audited fields VERDICT.md asked for:
  {"metric": "...", "value": N, "unit": "images/sec/chip",
   "vs_baseline": R, "device_kind": "...", "flops_per_step": F,
   "mfu": M, "tflops": T, "runs": [...]}

Measurement methodology (see BENCH_NOTES.md):
  * `block_until_ready` does NOT block through this host's remote-TPU
    tunnel (measured: a 20-step loop "finishes" at 54 PFLOP/s).  All round-1
    numbers were dispatch-rate artifacts.  Every timing here forces a HOST
    READBACK of a value data-dependent on the full computation.
  * Steps are chained inside ONE jitted lax.scan, so the number is device
    throughput (what a production input pipeline sustains), not tunnel
    round-trip latency (~20 ms/dispatch here, ~100 us on a local host).
  * FLOPs come from the compiled step's cost_analysis() — no hand model.
  * value = median over WINDOWS windows; min/max recorded in "runs".

`vs_baseline` is ours / the PyTorch reference on this host's CPU (the only
reference hardware available; the reference publishes no numbers —
BASELINE.md).  The control is cached in baseline_measured.json.

Headline config: BASELINE.md config 3 shape — VGG16_small, B-spline KAN
convs (grid 5, order 3), batch 1024, CIFAR-10 train step (on-device
augment + fwd + bwd + AdamW).  `python bench.py --all` additionally runs
BASELINE configs 1/2/4/5 and writes BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

BATCH = 1024
STEPS = 20
WINDOWS = 5
ARCH = "VGG16_small"
HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, "baseline_measured.json")

# bf16 peak TFLOP/s per chip (public spec sheets)
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v5": 459.0,
    "TPU v6 lite": 918.0,   # v6e / Trillium
    "TPU v6e": 918.0,
}


def _sync(x):
    """Honest device sync: fetch one data-dependent scalar to the host."""
    import jax
    import numpy as np

    return np.asarray(jax.device_get(x)).ravel()[:1]


def _flops_of(jitted, *args) -> float:
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _timed_windows(run_once, items_per_call: int, windows: int = WINDOWS):
    """run_once() must end in a host readback.  Returns items/sec list."""
    run_once()  # warmup / compile
    out = []
    for _ in range(windows):
        t0 = time.perf_counter()
        run_once()
        out.append(items_per_call / (time.perf_counter() - t0))
    out.sort()
    return out


def _mfu_fields(ips: float, flops_per_item: float, device_kind: str):
    tflops = ips * flops_per_item / 1e12
    peak = PEAK_TFLOPS.get(device_kind)
    return {
        "tflops": round(tflops, 2),
        "mfu": round(tflops / peak, 4) if peak else None,
        "peak_tflops_assumed": peak,
    }


# ------------------------------------------------------------ config 3
def measure_vgg_train(batch=BATCH, steps=STEPS, bf16_basis=False,
                      stack_basis=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu.models.vgg import vggkan
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    from convkan_tpu.nn.kan_conv import set_perf_defaults

    overrides = {}
    if bf16_basis:
        # process-default override (a bare class-attribute assignment on
        # a flax dataclass is a no-op); the --bf16_basis variant row is
        # explicitly NOT torch-bit-exact — see BENCH_NOTES.md
        overrides["basis_bf16"] = True
    if stack_basis:
        # basis assembly A/B variants (see KanConvND.basis_build):
        # 'stack' is bit-identical; 'bcast' is the single-operand
        # broadcast form (f32-roundoff-equal for the kan family)
        overrides["basis_build"] = stack_basis
    if "--island_bf16" in sys.argv:
        # native-bf16 basis+contraction island (wide cotangents stay
        # bf16 in HBM) — see KanConvND.island_bf16
        overrides["island_bf16"] = True
    # restored at the end of this measurement — the defaults are
    # process-wide, and later --all rows must record the exact-f32
    # baseline they claim to (set_perf_defaults returns the previous
    # values for exactly this purpose)
    prev = set_perf_defaults(**overrides) if overrides else {}
    try:
        return _measure_vgg_train_body(batch, steps)
    finally:
        if prev:
            set_perf_defaults(**prev)


def _measure_vgg_train_body(batch, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu.models.vgg import vggkan
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    model = vggkan(3, 10, arch=ARCH, kan_conv="KAN", classifier_type="Linear")
    x0 = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=100)
    step = make_train_step(model, "CIFAR10", augment=True)

    rng = jax.random.PRNGKey(1)
    xb = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, 32, 32, 3), dtype=np.uint8))
    yb = jnp.asarray(np.random.RandomState(1).randint(
        0, 10, (batch,), dtype=np.int32))

    flops = _flops_of(step, state, rng, xb, yb)

    # one dispatch, `steps` train steps chained on device
    def scan_steps(state, rng):
        def body(s, i):
            s, loss = step.__wrapped__(s, jax.random.fold_in(rng, i), xb, yb)
            return s, loss
        s, losses = jax.lax.scan(body, state, jnp.arange(steps))
        return s, losses[-1]

    scan_jit = jax.jit(scan_steps, donate_argnums=0)

    holder = {"state": state}

    def run_once():
        holder["state"], loss = scan_jit(holder["state"], rng)
        _sync(loss)

    runs = _timed_windows(lambda: run_once(), batch * steps)
    return {
        "metric": "kan_vgg_cifar10_train_throughput",
        "unit": "images/sec/chip",
        "value": round(statistics.median(runs), 2),
        "runs": [round(r, 1) for r in runs],
        "flops_per_step": flops,
        "flops_per_image": round(flops / batch),
        "batch": batch,
        "steps_per_window": steps,
    }


# ------------------------------------------------------------ config 1
def measure_kanconv_micro():
    """KANConv2DLayer(3->16, k=3, grid 5, order 3) fwd+bwd, 16x3x32x32
    (BASELINE config 1)."""
    import jax
    import jax.numpy as jnp

    from convkan_tpu.nn.kan_conv import KANConv2DLayer

    m = KANConv2DLayer(3, 16, 3, padding=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x, train=False)

    def loss(p, x):
        return jnp.sum(m.apply(p, x, train=False) ** 2)

    g = jax.jit(jax.grad(loss))
    flops = _flops_of(g, params, x)
    reps = 200

    @jax.jit
    def many(p, x):
        def body(c, i):
            gr = jax.grad(loss)(p, x + c)
            return c * 0.0, gr["params"]["poly_w"][0, 0, 0, 0]
        c, gs = jax.lax.scan(body, 0.0, jnp.arange(reps))
        return gs[-1]

    def run_once():
        _sync(many(params, x))

    runs = _timed_windows(run_once, reps)
    med = statistics.median(runs)
    return {
        "metric": "kanconv2d_3to16_fwdbwd",
        "unit": "us/step",
        "value": round(1e6 / med, 2),
        "runs_steps_per_sec": [round(r, 1) for r in runs],
        "flops_per_step": flops,
    }


# ------------------------------------------------------------ config 2
def measure_fastkan_mlp(batch=8192, steps=500):
    """FastKAN MLP [784,128,64,10] MNIST-shaped train step (config 2).

    steps=500: one step is ~0.07 ms of device work, so a 50-step window
    was dominated by the ~20 ms tunnel round trip (run-to-run spread
    0.94-1.22M img/s); 500 chained steps put compute at >10x the RTT.
    batch=8192: measured sweep (BENCH_NOTES round 3) — batch 1024 swings
    2.4-5.5M img/s across sessions; 8192 pins 5.6M with <1% spread."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
    from convkan_tpu.train.state import create_train_state
    from convkan_tpu.train.metrics import cross_entropy_loss

    model = MLP_KAN_FACTORY["FastKAN"]([784, 128, 64, 10])
    x0 = jnp.zeros((batch, 784), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=100)
    xb = jnp.asarray(np.random.RandomState(0).rand(batch, 784), jnp.float32)
    yb = jnp.asarray(np.random.RandomState(1).randint(
        0, 10, (batch,), dtype=np.int32))

    def step(state, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, xb, train=True,
                              rngs={"dropout": rng})
            return cross_entropy_loss(out, yb)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    flops = _flops_of(jax.jit(step), state, jax.random.PRNGKey(1))

    @jax.jit
    def scan_steps(state, rng):
        def body(s, i):
            return step(s, jax.random.fold_in(rng, i))
        s, losses = jax.lax.scan(body, state, jnp.arange(steps))
        return s, losses[-1]

    holder = {"state": state}

    def run_once():
        holder["state"], loss = scan_steps(holder["state"],
                                           jax.random.PRNGKey(2))
        _sync(loss)

    runs = _timed_windows(run_once, batch * steps)
    return {
        "metric": "fastkan_mlp_mnist_train_throughput",
        "unit": "images/sec/chip",
        "value": round(statistics.median(runs), 2),
        "runs": [round(r, 1) for r in runs],
        "flops_per_step": flops,
        "batch": batch,
    }


# ------------------------------------------------------------ config 4
def measure_wavkan(batch=2048, steps=10, use_pallas="auto",
                   island_bf16=False):
    """WavKAN conv stack (mexican_hat, fast) CIFAR-100 train step
    (config 4; stack shape from wav_kan_layers.py:469-476).

    Batch 2048 (round 4): the round-3 b1024 row was still
    occupancy-limited.  Measured ladder (exact-parity f32):
    b256 14.6k -> b1024 16.3k -> b2048 21.1k img/s; b4096 OOMs (the two
    wide psi tensors alone are 17 GB f32).  island_bf16: b1024 20.2k ->
    b2048 23.4k (b4096 fits in bf16 but is no faster, 23.1k).
    island_bf16=True materializes the psi tensor (this config's dominant
    HBM traffic) in bf16 — the opt-in non-bit-exact variant, see
    WavKANConvND.island_bf16 and BENCH_NOTES.md.  Alternative psi
    assemblies (flat concat build, jax.checkpoint remat) both measured
    slower and stay opt-in knobs (set_wav_perf_defaults)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

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
                    x.shape[-1], c, 3, padding=1, wavelet_type="mexican_hat",
                    wav_version="fast", use_pallas=use_pallas,
                    island_bf16=True if island_bf16 else None)(x, train=train)
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
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            return cross_entropy_loss(out, yb), mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_stats), loss

    flops = _flops_of(jax.jit(step), state, jax.random.PRNGKey(1))

    @jax.jit
    def scan_steps(state, rng):
        def body(s, i):
            return step(s, jax.random.fold_in(rng, i))
        s, losses = jax.lax.scan(body, state, jnp.arange(steps))
        return s, losses[-1]

    holder = {"state": state}

    def run_once():
        holder["state"], loss = scan_steps(holder["state"],
                                           jax.random.PRNGKey(2))
        _sync(loss)

    runs = _timed_windows(run_once, batch * steps)
    return {
        "metric": "wavkan_cifar100_train_throughput",
        "unit": "images/sec/chip",
        "value": round(statistics.median(runs), 2),
        "runs": [round(r, 1) for r in runs],
        "flops_per_step": flops,
        "batch": batch,
    }


# ------------------------------------------------------------ config 5
def measure_efficientnetv2_224(batch=128, steps=5, arch="s", remat=True,
                               island_bf16=False, remat_policy=None):
    """KAN-EfficientNetV2 @224^2 train step — the other half of BASELINE
    config 5 (models/kan_efficientnetv2.py:547).  FastKAN convs like the
    MNv3 row; arch 's' is EffV2's canonical 224^2 config (the reference's
    'kan_tiny' is a stem-stride-1 CIFAR config).  remat=True: the s-arch
    basis-expanded autodiff temporaries exceed a v5e's HBM without it
    (models/efficientnetv2.py:199-204)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu.models.efficientnetv2 import efficientnetv2_kan
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    if island_bf16:
        from convkan_tpu.nn.kan_conv import set_perf_defaults
        prev = set_perf_defaults(island_bf16=True)
    try:
        model = efficientnetv2_kan(arch=arch, num_classes=10,
                                   kan_conv="FastKAN", remat=remat,
                                   remat_policy=remat_policy)
        x0 = jnp.zeros((batch, 224, 224, 3), jnp.float32)
        state = create_train_state(model, jax.random.PRNGKey(0), x0,
                                   steps_per_epoch=100)
        step = make_train_step(model, "CIFAR10", augment=False,
                               imagenet=True)
        rng = jax.random.PRNGKey(1)
        xb = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (batch, 224, 224, 3), dtype=np.uint8))
        yb = jnp.asarray(np.random.RandomState(1).randint(
            0, 10, (batch,), dtype=np.int32))
        flops = _flops_of(step, state, rng, xb, yb)

        def scan_steps(state, rng):
            def body(s, i):
                s, loss = step.__wrapped__(
                    s, jax.random.fold_in(rng, i), xb, yb)
                return s, loss
            s, losses = jax.lax.scan(body, state, jnp.arange(steps))
            return s, losses[-1]

        scan_jit = jax.jit(scan_steps, donate_argnums=0)
        holder = {"state": state}

        def run_once():
            holder["state"], loss = scan_jit(holder["state"], rng)
            _sync(loss)

        runs = _timed_windows(run_once, batch * steps, windows=3)
    finally:
        if island_bf16:
            set_perf_defaults(**prev)
    return {
        "metric": f"kan_efficientnetv2_{arch}_224_train_throughput",
        "unit": "images/sec/chip",
        "value": round(statistics.median(runs), 2),
        "runs": [round(r, 1) for r in runs],
        "flops_per_step": flops,
        "batch": batch,
        "remat": remat,
        "remat_policy": remat_policy or "full",
    }


def measure_mobilenetv3_224(batch=512, steps=5, remat=False,
                            remat_policy=None):
    """KAN-MobileNetV3 small @224^2 train step (config 5, single chip —
    the dp-mesh variant is exercised by __graft_entry__.dryrun_multichip).

    The round-2 row (2.58k img/s) was batch-starved.  Measured on v5e:
    batch 128 no-remat 4.81k, batch 256 REMAT 4.83k, batch 256 no-remat
    **5.25k** (fits HBM; 2.04x round 2) — see BENCH_NOTES.md."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    model = mobilenet_v3_kan("small", num_classes=10,
                             kan_conv="FastKAN", remat=remat,
                             remat_policy=remat_policy)
    x0 = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               steps_per_epoch=100)
    step = make_train_step(model, "CIFAR10", augment=False, imagenet=True)
    rng = jax.random.PRNGKey(1)
    xb = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, 224, 224, 3), dtype=np.uint8))
    yb = jnp.asarray(np.random.RandomState(1).randint(
        0, 10, (batch,), dtype=np.int32))
    flops = _flops_of(step, state, rng, xb, yb)

    def scan_steps(state, rng):
        def body(s, i):
            s, loss = step.__wrapped__(s, jax.random.fold_in(rng, i), xb, yb)
            return s, loss
        s, losses = jax.lax.scan(body, state, jnp.arange(steps))
        return s, losses[-1]

    scan_jit = jax.jit(scan_steps, donate_argnums=0)
    holder = {"state": state}

    def run_once():
        holder["state"], loss = scan_jit(holder["state"], rng)
        _sync(loss)

    runs = _timed_windows(run_once, batch * steps, windows=3)
    return {
        "metric": "kan_mobilenetv3_small_224_train_throughput",
        "unit": "images/sec/chip",
        "value": round(statistics.median(runs), 2),
        "runs": [round(r, 1) for r in runs],
        "flops_per_step": flops,
        "batch": batch,
        "remat": remat,
        "remat_policy": remat_policy or "full",
    }


# ------------------------------------------------------------ reference
TORCH_BATCH = 128  # CPU control batch (per-image cost is batch-flat on CPU)


def measure_torch_reference() -> float:
    """Run the PyTorch reference's KAN-VGG one train step at a time on this
    host CPU (the reference is single-device CPU/GPU only: train.py:130)."""
    import sys
    import types

    sys.path.insert(0, "/root/reference")
    import torch

    # torchvision isn't installed; the reference package __init__ imports it
    # transitively (models/kan_efficientnet.py:10).  Provide a minimal
    # SqueezeExcitation stand-in so the VGG import path works.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_misc = types.ModuleType("torchvision.ops.misc")

        class _SE(torch.nn.Module):
            def __init__(self, input_channels, squeeze_channels,
                         activation=torch.nn.ReLU,
                         scale_activation=torch.nn.Sigmoid):
                super().__init__()
                self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
                self.fc1 = torch.nn.Conv2d(input_channels, squeeze_channels, 1)
                self.fc2 = torch.nn.Conv2d(squeeze_channels, input_channels, 1)
                self.activation = activation()
                self.scale_activation = scale_activation()

            def forward(self, x):
                s = self.avgpool(x)
                s = self.activation(self.fc1(s))
                s = self.scale_activation(self.fc2(s))
                return x * s

        tv_misc.SqueezeExcitation = _SE
        tv_ops.misc = tv_misc
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.ops.misc"] = tv_misc

    torch.manual_seed(0)
    from models.kan_vgg import vggkan as ref_vggkan

    model = ref_vggkan(
        input_channels=3, num_classes=10, arch=ARCH, kan_conv="KAN",
        classifier_type="Linear")
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-3)
    crit = torch.nn.CrossEntropyLoss()
    x = torch.randn(TORCH_BATCH, 3, 32, 32)
    y = torch.randint(0, 10, (TORCH_BATCH,))
    steps = 3
    # warmup
    opt.zero_grad(); crit(model(x), y).backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return TORCH_BATCH * steps / dt


def measure_serving(batches=(1, 8, 1024), steps=100, bf16=False, int8=False):
    """Inference serving: per-batch-size latency/throughput of the
    flagship model's jitted forward (uint8 in -> logits), the deployment
    surface `utils/export.py` serializes.  bf16=True serves the whole
    forward (params + activations) in bfloat16 — standard TPU inference
    precision; logits differ from f32 at bf16 tolerance.  int8=True runs
    every conv as dynamic s8xs8->s32 PTQ (config.quant_mode) — int8 MXU
    peak is 2x bf16 and the wide KAN basis tensor hits HBM at 1/4 the
    f32 bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu import config as _cfg
    from convkan_tpu.models.vgg import vggkan
    from convkan_tpu.train.data import normalize_batch
    from convkan_tpu.train.state import create_train_state

    if bf16:
        # the layer's own bf16 compute island (KanConvND.island_bf16):
        # narrow input + weights cast bf16 inside the layer, the wide
        # basis tensor and the conv run natively bf16, output cast back —
        # the supported mixed-precision path (blanket-casting the param
        # tree instead leaves the f32 basis constants promoting the conv
        # lhs back to f32, a dtype mismatch)
        from convkan_tpu.nn.kan_conv import set_perf_defaults
        set_perf_defaults(island_bf16=True)
    model = vggkan(3, 10, arch=ARCH, kan_conv="KAN", classifier_type="Linear")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 32, 3), jnp.float32),
                               steps_per_epoch=100)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    rows = {}
    for b in batches:
        xb = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (b, 32, 32, 3), dtype=np.uint8))

        def fwd(acc, xb):
            # inject the scan-carry dependence BEFORE the bf16 cast:
            # `x + acc*0` with an f32 acc promotes bf16 back to f32 and
            # silently un-casts the input
            x = normalize_batch(xb, "CIFAR10") + acc * 0
            if bf16:
                x = x.astype(jnp.bfloat16)
            with _cfg.quant_mode("int8" if int8 else None):
                out = model.apply(variables, x, train=False)
            return jnp.sum(out).astype(jnp.float32)

        def scan_steps(xb):
            def body(acc, _):
                s = fwd(acc * 1e-20, xb)
                return s, s
            _, ys = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                 jnp.arange(steps))
            return ys[-1]

        jitted = jax.jit(scan_steps)
        _sync(jitted(xb))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(jitted(xb))
            times.append((time.perf_counter() - t0) / steps)
        ms = statistics.median(times)
        rows[f"batch_{b}"] = {"latency_ms": round(ms * 1e3, 4),
                              "images_per_sec": round(b / ms, 1)}
    return {"metric": "kan_vgg_cifar10_serving", "unit": "per-batch rows",
            "rows": rows}


def measure_serving_http(concurrency=(1, 8, 32), n_requests=192):
    """Serving through the FULL stack — HTTP + dynamic batcher + bucketed
    jitted forward (convkan_tpu/serve.py) — with batch-1 requests from
    concurrent clients.  This is what a deployment actually sustains;
    the coalescing stats show the batcher turning concurrent singles
    into shared device steps."""
    import json as _json
    import threading
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu.models.vgg import vggkan
    from convkan_tpu.serve import InferenceEngine, make_server
    from convkan_tpu.train.state import create_train_state

    model = vggkan(3, 10, arch=ARCH, kan_conv="KAN",
                   classifier_type="Linear")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 32, 3), jnp.float32),
                               steps_per_epoch=100)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    engine = InferenceEngine(model, variables, "CIFAR10", (32, 32, 3),
                             buckets=(1, 8, 32), batch_timeout_ms=2.0)
    server = make_server(engine, "bench", "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    x1 = np.random.RandomState(0).randint(
        0, 256, (1, 32, 32, 3), dtype=np.uint8).tolist()
    body = _json.dumps({"instances": x1}).encode()
    url = f"http://127.0.0.1:{port}/predict"

    def one_request():
        req = urllib.request.Request(url, data=body, method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=60) as r:
            r.read()
        return (time.perf_counter() - t0) * 1e3

    one_request()  # warm
    rows = {}
    try:
        for c in concurrency:
            per = n_requests // c
            lat = [[] for _ in range(c)]

            def client(i):
                for _ in range(per):
                    lat[i].append(one_request())

            t0 = time.perf_counter()
            ts = [threading.Thread(target=client, args=(i,))
                  for i in range(c)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            wall = time.perf_counter() - t0
            flat = sorted(sum(lat, []))
            rows[f"clients_{c}"] = {
                "qps": round(per * c / wall, 1),
                "latency_ms_p50": round(flat[len(flat) // 2], 3),
                "latency_ms_p99": round(flat[int(0.99 * (len(flat) - 1))],
                                        3),
            }
        m = engine.metrics()
        rows["coalescing"] = {
            "requests": m["requests"], "device_batches": m["device_batches"],
            "avg_batch": round(m["instances"] /
                               max(1, m["device_batches"]), 2)}
    finally:
        server.shutdown()
        server.server_close()
        engine.close()
    return {"metric": "kan_vgg_cifar10_serving_http",
            "unit": "per-concurrency rows", "rows": rows}


def measure_serving_fold_bn(batches=(1, 8, 256), steps=50):
    """Deployment transform A/B: KAN-MobileNetV3-small @224² inference
    with and without `utils/fold_bn.fold_batch_norms` (BN eps 0.001).
    Variables are closed over as jit constants (the export_forward
    serving pattern), so folded BNs constant-fold into the conv
    epilogue."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convkan_tpu.models.mobilenetv3 import mobilenet_v3_kan
    from convkan_tpu.utils.fold_bn import fold_batch_norms

    model = mobilenet_v3_kan("small", 1000, conv_type="conv")
    x0 = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    folded, n_folded = fold_batch_norms(variables, eps=1e-3)

    def time_variant(variables):
        out = {}
        for b in batches:
            xb = jnp.asarray(np.random.RandomState(0).rand(
                b, 224, 224, 3).astype(np.float32))

            def scan_steps(xb):
                def body(acc, _):
                    y = model.apply(variables, xb + acc * 1e-20,
                                    train=False)
                    return jnp.sum(y), ()
                s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    jnp.arange(steps))
                return s
            jitted = jax.jit(scan_steps)
            _sync(jitted(xb))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                _sync(jitted(xb))
                times.append((time.perf_counter() - t0) / steps)
            ms = statistics.median(times)
            out[f"batch_{b}"] = {"latency_ms": round(ms * 1e3, 4),
                                 "images_per_sec": round(b / ms, 1)}
        return out

    base = time_variant(variables)
    fold = time_variant(folded)
    speedup = {k: round(fold[k]["images_per_sec"]
                        / base[k]["images_per_sec"], 3) for k in base}
    return {"metric": "kan_mnv3_224_serving_fold_bn",
            "unit": "per-batch rows", "n_folded": n_folded,
            "rows": {"unfolded": base, "folded": fold,
                     "speedup": speedup}}


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    if os.path.exists("/root/reference"):
        try:
            v = measure_torch_reference()
            with open(BASELINE_CACHE, "w") as f:
                json.dump({"torch_cpu_images_per_sec": v,
                           "config": f"{ARCH} KAN conv fwd+bwd+AdamW, "
                                     "host CPU"}, f)
            return v
        except Exception:
            return 0.0
    return 0.0


def main():
    import jax

    # persistent compile cache: the remote-TPU compiles here run minutes
    # under contention; repeat bench invocations on the same host reuse
    # the artifacts (same mechanism as tests/conftest.py on CPU)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/convkan_jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    device_kind = jax.devices()[0].device_kind
    if "--serving" in sys.argv:
        if "--bf16" in sys.argv and "--int8" in sys.argv:
            raise SystemExit("pick one serving precision: --int8 or --bf16 "
                             "(serve.py rejects the combination too)")
        out = measure_serving(bf16="--bf16" in sys.argv,
                              int8="--int8" in sys.argv)
        if "--bf16" in sys.argv:
            out["metric"] += "_bf16"
        if "--int8" in sys.argv:
            out["metric"] += "_int8"
        out["device_kind"] = device_kind
        print(json.dumps(out))
        return
    if "--serving_fold_bn" in sys.argv:
        out = measure_serving_fold_bn()
        out["device_kind"] = device_kind
        print(json.dumps(out))
        return
    if "--serving_http" in sys.argv:
        out = measure_serving_http()
        out["device_kind"] = device_kind
        print(json.dumps(out))
        return
    def _flag_val(name, default=None, cast=str):
        if name in sys.argv:
            return cast(sys.argv[sys.argv.index(name) + 1])
        return default

    if "--effv2" in sys.argv:
        # standalone EffV2-s @224^2 row (the second BASELINE config-5
        # model; --island_bf16 for the opt-in bf16 island; --batch /
        # --remat_policy / --no_remat for the selective-remat A/B,
        # VERDICT r4 #4)
        out = measure_efficientnetv2_224(
            batch=_flag_val("--batch", 128, int),
            island_bf16="--island_bf16" in sys.argv,
            remat="--no_remat" not in sys.argv,
            remat_policy=_flag_val("--remat_policy"))
        if "--island_bf16" in sys.argv:
            out["metric"] += "_islandbf16"
        out.update(_mfu_fields(out["value"],
                               out["flops_per_step"] / out["batch"],
                               device_kind))
        out["device_kind"] = device_kind
        print(json.dumps(out))
        return
    if "--mnv3" in sys.argv:
        # standalone MNv3-small @224^2 row with the batch-ladder /
        # selective-remat knobs (VERDICT r4 #3)
        def run():
            return measure_mobilenetv3_224(
                batch=_flag_val("--batch", 256, int),
                remat="--remat" in sys.argv or bool(
                    _flag_val("--remat_policy")),
                remat_policy=_flag_val("--remat_policy"))
        if "--island_bf16" in sys.argv:
            from convkan_tpu.nn.kan_conv import set_perf_defaults
            prev = set_perf_defaults(island_bf16=True)
            try:
                out = run()
            finally:
                set_perf_defaults(**prev)
            out["metric"] += "_islandbf16"
        else:
            out = run()
        out.update(_mfu_fields(out["value"],
                               out["flops_per_step"] / out["batch"],
                               device_kind))
        out["device_kind"] = device_kind
        print(json.dumps(out))
        return
    if "--wavkan" in sys.argv:
        # standalone config-4 row (A/B surface for the psi-bf16 island)
        out = measure_wavkan(island_bf16="--island_bf16" in sys.argv)
        if "--island_bf16" in sys.argv:
            out["metric"] += "_islandbf16"
        out.update(_mfu_fields(out["value"],
                               out["flops_per_step"] / out["batch"],
                               device_kind))
        out["device_kind"] = device_kind
        print(json.dumps(out))
        return
    _build = ("stack" if "--stack_basis" in sys.argv
              else "bcast" if "--bcast_basis" in sys.argv else None)
    head = measure_vgg_train(bf16_basis="--bf16_basis" in sys.argv,
                             stack_basis=_build)
    if "--bf16_basis" in sys.argv:
        head["metric"] += "_bf16basis"
    if "--island_bf16" in sys.argv:
        head["metric"] += "_islandbf16"
    if _build:
        head["metric"] += f"_{_build}basis"
    head.update(_mfu_fields(head["value"],
                            head["flops_per_step"] / head["batch"],
                            device_kind))
    head["device_kind"] = device_kind

    if "--all" in sys.argv:
        details = {"device_kind": device_kind, "config3": head}
        def _with_island(fn):
            # process-default island for configs without their own kwarg;
            # restored so later rows measure the exact path
            def run():
                from convkan_tpu.nn.kan_conv import set_perf_defaults
                prev = set_perf_defaults(island_bf16=True)
                try:
                    return fn()
                finally:
                    set_perf_defaults(**prev)
            return run

        for key, fn in (("config1", measure_kanconv_micro),
                        ("config2", measure_fastkan_mlp),
                        # round 4: the bf16 island now covers the MLP
                        # spline path too (FastKANLinear.island_bf16) —
                        # measured +31% on this row
                        ("config2_islandbf16",
                         _with_island(measure_fastkan_mlp)),
                        ("config4", measure_wavkan),
                        ("config4_islandbf16",
                         lambda: measure_wavkan(island_bf16=True)),
                        ("config5", measure_mobilenetv3_224),
                        ("config5_islandbf16",
                         _with_island(measure_mobilenetv3_224)),
                        # the other half of BASELINE config 5 (VERDICT r3
                        # #2): KAN-EfficientNetV2-s @224^2
                        ("config5_effv2", measure_efficientnetv2_224),
                        ("config5_effv2_islandbf16",
                         lambda: measure_efficientnetv2_224(
                             island_bf16=True))):
            try:
                row = fn()
                # every row carries tflops/mfu (VERDICT r2 #2), derived
                # from its own cost_analysis FLOPs
                if row.get("unit") == "images/sec/chip" and "batch" in row:
                    row.update(_mfu_fields(
                        row["value"], row["flops_per_step"] / row["batch"],
                        device_kind))
                elif row.get("unit") == "us/step":
                    row.update(_mfu_fields(
                        1e6 / row["value"], row["flops_per_step"],
                        device_kind))
                details[key] = row
            except Exception as e:  # record, don't abort the headline
                details[key] = {"error": f"{type(e).__name__}: {e}"}
        with open(os.path.join(HERE, "BENCH_DETAILS.json"), "w") as f:
            json.dump(details, f, indent=1)

    base = get_baseline()
    head["vs_baseline"] = round(head["value"] / base, 2) if base > 0 else 0.0
    head["baseline"] = "PyTorch reference, same model, this host's CPU"
    # stable key order for the driver: metric/value/unit/vs_baseline first
    ordered = {k: head[k] for k in
               ("metric", "value", "unit", "vs_baseline") if k in head}
    ordered.update({k: v for k, v in head.items() if k not in ordered})
    print(json.dumps(ordered))


if __name__ == "__main__":
    main()
