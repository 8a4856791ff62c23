"""A/B: wide-matmul Pallas KAN-conv kernel vs the XLA (jnp) path, real TPU.

Measures a fwd+bwd (grad wrt params and input) microbench per layer shape
of the BASELINE config-3 net (VGG16_small KAN @ CIFAR), plus whole-model
train-step A/B.  Timing follows bench.py's methodology: steps chained in
one lax.scan, host readback of a data-dependent scalar (block_until_ready
does not block through the axon tunnel).

Usage:  python tools/ab_kernel.py [--family kan] [--batch 256] [--steps 10]
Writes markdown rows to stdout; run on the real chip.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convkan_tpu.nn.kan_conv import KanConvND  # noqa: E402

# (C, O, H) — VGG16_small KAN layer shapes at CIFAR-10 32x32
SHAPES = [
    (3, 16, 32), (16, 16, 32),
    (16, 32, 16), (32, 32, 16),
    (32, 64, 8), (64, 64, 8),
    (64, 128, 4), (128, 128, 4),
    (128, 128, 2),
]


def _sync(x):
    return np.asarray(jax.device_get(x)).ravel()[:1]


def time_one(module, x, steps, windows=5):
    v = module.init(jax.random.PRNGKey(1), x, train=False)

    def loss_fn(params, xx):
        y = module.apply({"params": params}, xx, train=False)
        return jnp.sum(y * y)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def scan_steps(params, xx):
        def body(carry, _):
            p, acc = carry
            loss, (gp, gx) = grad_fn(p, xx + acc * 0)
            # make next iteration data-dependent on this one
            acc = loss * 1e-20
            return (p, acc), loss
        (_, _), losses = jax.lax.scan(
            body, (params, jnp.zeros((), x.dtype)), jnp.arange(steps))
        return losses[-1]

    jitted = jax.jit(scan_steps)
    params = v["params"]
    out = jitted(params, x)
    _sync(out)  # compile + warmup
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        _sync(jitted(params, x))
        times.append((time.perf_counter() - t0) / steps)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="kan")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated SHAPES indices, e.g. 0,1,2")
    args = ap.parse_args()
    shapes = SHAPES
    if args.only:
        shapes = [SHAPES[int(i)] for i in args.only.split(",")]

    print(f"device: {jax.devices()[0].device_kind}  family={args.family} "
          f"batch={args.batch} (fwd+bwd step time, median of 5)")
    print("| C->O @ HxW | XLA ms | wide-Pallas ms | speedup |")
    print("|---|---|---|---|")
    rows = []
    for C, O, H in shapes:
        kw = dict(family=args.family, input_dim=C, output_dim=O,
                  kernel_size=3, ndim=2, padding=1, degree=3, grid_size=5)
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (args.batch, H, H, C), jnp.float32)
        try:
            t_xla = time_one(KanConvND(use_pallas=False, **kw), x, args.steps)
            t_pl = time_one(KanConvND(use_pallas=True, **kw), x, args.steps)
        except Exception as e:  # noqa: BLE001
            print(f"| {C}->{O} @{H}x{H} | ERROR {type(e).__name__}: "
                  f"{str(e)[:80]} | | |")
            continue
        sp = t_xla / t_pl
        rows.append((C, O, H, t_xla, t_pl, sp))
        print(f"| {C}->{O} @{H}x{H} | {t_xla*1e3:.3f} | {t_pl*1e3:.3f} "
              f"| {sp:.2f}x |", flush=True)
    wins = sum(1 for r in rows if r[5] > 1.0)
    print(f"\nwide kernel wins {wins}/{len(rows)} rows")


if __name__ == "__main__":
    main()
