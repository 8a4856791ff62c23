"""A/B: fused Pallas WavKAN psi-conv vs the XLA materialization path, TPU.

Per-layer fwd+bwd microbench on the BASELINE config-4 stack shapes
(wav_kan_layers.py:469-476 @ CIFAR-100), per wavelet type, plus the whole
config-4 train step both ways.  Timing = bench.py methodology: steps
chained in one lax.scan, host readback of a data-dependent scalar.

Usage:  python tools/ab_wav.py [--batch 256] [--steps 20] [--types mexican_hat,...]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/convkan_jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convkan_tpu.nn.wav_conv import WavKANConvND  # noqa: E402

# (Cin, O, H) — the config-4 WavNet layer shapes (32x32 CIFAR + 2x pools)
SHAPES = [(3, 32, 32), (32, 64, 16), (64, 128, 8)]


def _sync(x):
    return np.asarray(jax.device_get(x)).ravel()[:1]


def time_layer(module, x, steps, windows=5):
    v = module.init(jax.random.PRNGKey(1), x, train=False)

    def loss_fn(params, xx):
        vv = {"params": params}
        if "batch_stats" in v:
            vv["batch_stats"] = v["batch_stats"]
        y = module.apply(vv, xx, train=False)
        return jnp.sum(y * y)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def scan_steps(params, xx):
        def body(carry, _):
            p, acc = carry
            loss, (gp, gx) = grad_fn(p, xx + acc * 0)
            return (p, loss * 1e-20), loss
        (_, _), losses = jax.lax.scan(
            body, (params, jnp.zeros((), x.dtype)), jnp.arange(steps))
        return losses[-1]

    jitted = jax.jit(scan_steps)
    params = v["params"]
    _sync(jitted(params, x))
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        _sync(jitted(params, x))
        times.append((time.perf_counter() - t0) / steps)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--types", default="mexican_hat,shannon,meyer")
    ap.add_argument("--net", action="store_true",
                    help="also run the whole config-4 train step A/B")
    ap.add_argument("--only", default=None,
                    help="comma-separated SHAPES indices, e.g. 1,2")
    args = ap.parse_args()

    print(f"| wavelet | C->O @ HxW | XLA ms | Pallas ms | speedup |")
    print(f"|---|---|---|---|---|")
    shapes = SHAPES if args.only is None else [
        SHAPES[int(i)] for i in args.only.split(",")]
    for wt in args.types.split(","):
        for (C, O, H) in shapes:
            x = jnp.asarray(
                np.random.RandomState(0).randn(args.batch, H, H, C),
                jnp.float32)
            kw = dict(input_dim=C, output_dim=O, kernel_size=3, ndim=2,
                      padding=1, wavelet_type=wt, wav_version="fast")
            t_xla = time_layer(WavKANConvND(use_pallas=False, **kw), x,
                               args.steps)
            t_pal = time_layer(WavKANConvND(use_pallas=True, **kw), x,
                               args.steps)
            print(f"| {wt} | {C}->{O} @{H}x{H} | {t_xla*1e3:.2f} | "
                  f"{t_pal*1e3:.2f} | {t_xla/t_pal:.2f}x |", flush=True)

    if args.net:
        import bench
        for flag in (False, True):
            r = bench.measure_wavkan(batch=args.batch, steps=10,
                                     use_pallas=flag)
            print(f"config4 use_pallas={flag}: {r['value']:.1f} img/s",
                  flush=True)


if __name__ == "__main__":
    main()
