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
from typing import Optional

_MATMUL_DTYPE: Optional[str] = None


def set_matmul_dtype(dtype: Optional[str]):
    global _MATMUL_DTYPE
    assert dtype in (None, "bfloat16", "float32")
    _MATMUL_DTYPE = None if dtype == "float32" else dtype


def get_matmul_dtype() -> Optional[str]:
    return _MATMUL_DTYPE


@contextlib.contextmanager
def matmul_dtype(dtype: Optional[str]):
    global _MATMUL_DTYPE
    prev = _MATMUL_DTYPE
    set_matmul_dtype(dtype)
    try:
        yield
    finally:
        _MATMUL_DTYPE = prev
