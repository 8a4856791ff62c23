"""Tracing / profiling / debugging hooks (SURVEY.md §5).

The reference only has ad-hoc CUDA-event timers (evaluations.py:36-58) and
a permanently-enabled autograd anomaly tripwire (train.py:431).  Here:

  * `trace(logdir)` — jax.profiler trace context (Perfetto/XProf dump);
  * `StepTimer` — wall-clock per-step timing with device sync, the
    jit-era equivalent of the reference's forward timers;
  * `debug_nans(enable)` — the anomaly-detection analogue, but opt-in
    (the reference's always-on anomaly mode is a documented perf bug).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a scope to `logdir` (open with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True):
    """NaN/Inf tripwire — equivalent of torch.autograd.set_detect_anomaly
    (train.py:431), but opt-in because it forces re-execution on failure."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


class StepTimer:
    """Per-step wall-clock timing.  JAX dispatch is ASYNC: without a
    sync, each sample records only dispatch/queue time (microseconds) —
    you MUST pass a device value from the step to `sync()`, which blocks
    and folds the wait into the last sample.

    Usage:
        t = StepTimer()
        for batch in data:
            with t:
                state, loss = step(state, *batch)
            t.sync(loss)   # AFTER the block: folds the device wait into
                           # the sample just closed
        print(t.mean_ms, t.p50_ms)
    """

    def __init__(self):
        self.samples = []
        self._t0 = None
        self._out = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        # async dispatch: timing without a sync measures dispatch only; the
        # caller should sync the epoch tail — we record dispatch+queue time
        self.samples.append(time.perf_counter() - self._t0)
        return False

    def sync(self, value):
        """Block on a device value and account the wait into the last
        sample."""
        t0 = time.perf_counter()
        jax.block_until_ready(value)
        if self.samples:
            self.samples[-1] += time.perf_counter() - t0
        return value

    @property
    def mean_ms(self):
        return 1000.0 * sum(self.samples) / max(len(self.samples), 1)

    @property
    def p50_ms(self):
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        return 1000.0 * s[len(s) // 2]
