"""One-off diagnostic: where does the int8 serving slowdown come from?

Times three variants of the flagship serving forward on the real chip:
  f32       — baseline float conv
  int8_dyn  — the shipped dynamic path (per-batch max -> quantize -> conv)
  int8_stat — same quantized conv with *static* activation scales (no max
              pass; scale constants baked), the calibrated-PTQ upper bound

Run: python tools/probe_int8.py
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/convkan_jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    jax.block_until_ready(x)


def main():
    from convkan_tpu import config as _cfg
    from convkan_tpu import ops
    from convkan_tpu.models.vgg import vggkan
    from convkan_tpu.train.data import normalize_batch
    from convkan_tpu.train.state import create_train_state

    model = vggkan(3, 10, arch="VGG16_small", kan_conv="KAN",
                   classifier_type="Linear")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 32, 3), jnp.float32),
                               steps_per_epoch=100)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    b, steps = 1024, 50
    xb = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (b, 32, 32, 3), dtype=np.uint8))

    # monkeypatch a static-scale variant onto the conv funnel
    orig_int8 = ops.conv._conv_nd_int8

    def static_int8(x, w, stride, pad_spec, dilation, dn, groups, out_dtype):
        import jax.lax as lax
        ax = jnp.float32(0.05)  # pretend-calibrated constant
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ax),
                      -127.0, 127.0).astype(jnp.int8)
        aw = jnp.max(jnp.abs(w.astype(jnp.float32)),
                     axis=tuple(range(w.ndim - 1))) / 127.0
        aw = jnp.maximum(aw, jnp.float32(1e-12))
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / aw),
                      -127.0, 127.0).astype(jnp.int8)
        yq = lax.conv_general_dilated(
            xq, wq, window_strides=stride, padding=pad_spec,
            lhs_dilation=(1,) * len(pad_spec), rhs_dilation=dilation,
            dimension_numbers=dn, feature_group_count=groups,
            preferred_element_type=jnp.int32)
        return (yq.astype(jnp.float32) * (ax * aw)).astype(out_dtype)

    def bench(tag, mode, patch=None):
        if patch is not None:
            ops.conv._conv_nd_int8 = patch
        try:
            def fwd(acc, xb):
                x = normalize_batch(xb, "CIFAR10")
                with _cfg.quant_mode(mode):
                    out = model.apply(variables, x + acc * 0, train=False)
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
            ms = statistics.median(times) * 1e3
            print(f"{tag:10s} {ms:8.3f} ms/step  {b / statistics.median(times):10.0f} img/s")
        finally:
            ops.conv._conv_nd_int8 = orig_int8

    bench("f32", None)
    bench("int8_dyn", "int8")
    bench("int8_stat", "int8", patch=static_int8)


if __name__ == "__main__":
    main()
