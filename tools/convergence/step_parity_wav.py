"""Per-step WavKAN-VGG parity on identical batches (round 5, VERDICT r4
#5's WavKAN leg).

The reference's WavKAN VGG16_small is a NON-LEARNER under the reference
recipe (AdamW 1e-3, ExpLR 0.8): CE pins at ln 10 within one epoch on
both harnesses.  An epoch-scale curve there is just a flat line — and a
full reference epoch costs ~75 min on this host's single CPU core
(~29 s/step).  The drift-sensitive evidence that IS affordable: run BOTH
harnesses step-by-step from bit-identical init (init_state.pt migrated
via convert_vggkan) on bit-identical batches (no augmentation) and
compare the per-step training losses directly — the same design as
tests/test_train_parity.py's f64 oracle, at full VGG16_small scale in
production f32.

Usage:
    CONV_DATA=... CONV_STEPS=12 python tools/convergence/step_parity_wav.py torch
    CONV_DATA=... CONV_STEPS=12 python tools/convergence/step_parity_wav.py jax
    python tools/convergence/step_parity_wav.py report

Each leg writes steps_<side>.json into CONV_OUT; 'report' prints the
merged table and writes results/convergence/wavkan_step_parity.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

DATA = os.environ.get("CONV_DATA", "/tmp/convergence_h35.npz")
OUTDIR = os.environ.get("CONV_OUT", "/tmp/wav_step_parity")
STEPS = int(os.environ.get("CONV_STEPS", "12"))
BATCH = 128
LR, WD = 1e-3, 1e-3


def _batches():
    d = np.load(DATA)
    # the identical-sequence rule: RandomState(seed)=42, epoch-0 order
    idx = np.arange(len(d["x_train"]))
    np.random.RandomState(42).shuffle(idx)
    xs, ys = d["x_train"][idx], d["y_train"][idx]
    return [(xs[i * BATCH:(i + 1) * BATCH], ys[i * BATCH:(i + 1) * BATCH])
            for i in range(STEPS)]


MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
STD = np.array([0.2470, 0.2435, 0.2616], np.float32)


def run_torch():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "goldens"))
    sys.path.insert(0, "/root/reference")
    import tv_stub  # noqa: F401

    import torch
    import torch.nn as nn

    from models.kan_vgg import vggkan

    torch.manual_seed(42)
    model = vggkan(3, 10, kan_conv="WavKAN", classifier_type="Linear",
                   arch="VGG16_small", dropout_linear=0.0)
    os.makedirs(OUTDIR, exist_ok=True)
    torch.save(model.state_dict(), os.path.join(OUTDIR, "init_state.pt"))
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    crit = nn.CrossEntropyLoss()
    losses = []
    model.train()
    for xb, yb in _batches():
        x = (xb.astype(np.float32) / 255.0 - MEAN) / STD
        x = torch.from_numpy(np.ascontiguousarray(
            x.transpose(0, 3, 1, 2)))
        y = torch.from_numpy(yb.astype(np.int64))
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
        losses.append(float(loss.item()))
        print(f"torch step {len(losses)}: {losses[-1]:.6f}", flush=True)
    with open(os.path.join(OUTDIR, "steps_torch.json"), "w") as f:
        json.dump({"losses": losses}, f)


def run_jax():
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from convkan_tpu.models.vgg import vggkan
    from convkan_tpu.train.metrics import cross_entropy_loss
    from convkan_tpu.utils.torch_compat import convert_vggkan

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/convkan_jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    model = vggkan(3, 10, kan_conv="WavKAN", classifier_type="Linear",
                   arch="VGG16_small", dropout_linear=0.0)
    x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    sd = {k: np.asarray(v.detach().numpy(), np.float32)
          for k, v in torch.load(os.path.join(OUTDIR, "init_state.pt"),
                                 map_location="cpu").items()}
    variables = convert_vggkan(sd, model, variables)
    params = variables["params"]
    # the reference loop's optimizer semantics at step scale: constant lr
    # within epoch 0 (ExpLR steps per epoch), AdamW decoupled wd
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = model.apply({"params": p}, x, train=True,
                              rngs={"dropout": jax.random.PRNGKey(0)})
            return cross_entropy_loss(out, y)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for xb, yb in _batches():
        x = jnp.asarray((xb.astype(np.float32) / 255.0 - MEAN) / STD)
        y = jnp.asarray(yb.astype(np.int32))
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(np.asarray(jax.device_get(loss))))
        print(f"jax step {len(losses)}: {losses[-1]:.6f}", flush=True)
    with open(os.path.join(OUTDIR, "steps_jax.json"), "w") as f:
        json.dump({"losses": losses}, f)


def report():
    t = json.load(open(os.path.join(OUTDIR, "steps_torch.json")))["losses"]
    j = json.load(open(os.path.join(OUTDIR, "steps_jax.json")))["losses"]
    out = {"family": "WavKAN", "design": "identical init + batches, f32",
           "steps": [{"step": i + 1, "reference": t[i], "convkan_tpu": j[i],
                      "abs_gap": abs(t[i] - j[i])}
                     for i in range(min(len(t), len(j)))]}
    dest = os.path.join(os.path.dirname(__file__), "..", "..", "results",
                        "convergence", "wavkan_step_parity.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    for r in out["steps"]:
        print(f"step {r['step']:2d}  ref {r['reference']:.6f}  "
              f"tpu {r['convkan_tpu']:.6f}  gap {r['abs_gap']:.2e}")
    print("wrote", dest)


if __name__ == "__main__":
    {"torch": run_torch, "jax": run_jax, "report": report}[sys.argv[1]]()
