"""One-shot real-TPU measurement batch (round 3 serving/config2 work).

Run in the background with a generous timeout (remote compiles can take
minutes under contention — see BENCH_NOTES.md):

    nohup python tools/round3_tpu_batch.py > /tmp/r3_tpu_batch.json.log 2>&1 &

Emits one JSON line per experiment.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/convkan_jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402

device_kind = jax.devices()[0].device_kind


def emit(tag, obj):
    obj = dict(obj)
    obj["experiment"] = tag
    obj["device_kind"] = device_kind
    print(json.dumps(obj), flush=True)


# 1. BN folding serving A/B (KAN-MNv3-small @224², conv type)
try:
    emit("serving_fold_bn", bench.measure_serving_fold_bn())
except Exception as e:  # keep the batch going
    emit("serving_fold_bn", {"error": repr(e)})

# 2. bf16 whole-forward serving vs the known f32 rows
try:
    emit("serving_bf16", bench.measure_serving(bf16=True))
except Exception as e:
    emit("serving_bf16", {"error": repr(e)})

# 3. config2 batch sweep (batch is a free measurement choice, like
#    config5's batch-256; MNIST train set is 60k so 8192 is still <14%)
for b in (1024, 4096, 8192):
    try:
        r = bench.measure_fastkan_mlp(batch=b)
        r.update(bench._mfu_fields(r["value"],
                                   r["flops_per_step"] / b, device_kind))
        emit(f"config2_batch{b}", r)
    except Exception as e:
        emit(f"config2_batch{b}", {"error": repr(e)})
