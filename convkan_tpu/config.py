"""Global runtime configuration.

`matmul_dtype`: compute dtype for conv/matmul contractions ('bfloat16' or
None for full f32).  On TPU v5e the MXU's bf16 path has ~2x the f32
throughput; accumulation stays f32 (preferred_element_type).  Parameters
and all element-wise math (basis recurrences, norms) remain f32 — only the
contraction operands are cast, the standard TPU mixed-precision recipe.

NOTE: round 1's "measured" guidance here was based on broken timings
(see BENCH_NOTES.md round-1 retraction) and has been removed.  XLA's
DEFAULT precision already runs f32 convs through the MXU's bf16 passes
with f32 accumulation; explicit operand casting mainly reduces HBM
traffic for memory-bound shapes.  Profile on your hardware.

Usage:
    import convkan_tpu
    convkan_tpu.config.set_matmul_dtype('bfloat16')
or per-scope:
    with convkan_tpu.config.matmul_dtype('bfloat16'):
        ...
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

_MATMUL_DTYPE: Optional[str] = None
_QUANT_MODE: Optional[str] = None
# Scoped mode changes hold this for the context duration so two threads
# tracing concurrently (e.g. two InferenceEngines with different
# precisions, whose jits trace lazily in request threads) cannot compile
# each other's mode.  The contexts wrap trace-time code only — executed
# jitted calls never re-enter Python — so the serialization cost is one
# XLA trace, not steady-state serving.  RLock: contexts nest
# (serve.py force-disables inside an outer test context).
_MODE_LOCK = threading.RLock()


def set_matmul_dtype(dtype: Optional[str]):
    global _MATMUL_DTYPE
    assert dtype in (None, "bfloat16", "float32")
    _MATMUL_DTYPE = None if dtype == "float32" else dtype


def get_matmul_dtype() -> Optional[str]:
    return _MATMUL_DTYPE


@contextlib.contextmanager
def matmul_dtype(dtype: Optional[str]):
    global _MATMUL_DTYPE
    with _MODE_LOCK:
        prev = _MATMUL_DTYPE
        set_matmul_dtype(dtype)
        try:
            yield
        finally:
            _MATMUL_DTYPE = prev


def set_quant_mode(mode: Optional[str]):
    """Serving-time dynamic post-training quantization for every conv in
    the framework (ops/conv.py is the single funnel).

    'int8': symmetric per-output-channel weight scales + per-tensor
    activation scales, s8xs8->s32 on the MXU (v5e int8 peak is 2x bf16),
    dequantized back to the float output dtype.  Inference-only — round()
    has zero gradient, so training under this mode would silently stop
    learning the conv weights; the train CLI never sets it.  The reference
    has no quantization story at all (its deployment surface ends at
    `model(x)`, evaluations.py:107-129); this is a beyond-reference
    serving feature.  None: exact float path (default).
    """
    global _QUANT_MODE
    assert mode in (None, "int8")
    _QUANT_MODE = mode


def get_quant_mode() -> Optional[str]:
    return _QUANT_MODE


@contextlib.contextmanager
def quant_mode(mode: Optional[str]):
    global _QUANT_MODE
    with _MODE_LOCK:
        prev = _QUANT_MODE
        set_quant_mode(mode)
        try:
            yield
        finally:
            _QUANT_MODE = prev
