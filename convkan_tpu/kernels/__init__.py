"""Pallas TPU kernels for the hot KAN ops (with jnp reference paths)."""

import os as _os

# The Mosaic remote compile helper behind THIS environment's 'axon'
# remote-TPU tunnel needs TPU topology hints in the forwarded env or
# libtpu fails to initialize ("could not determine TPU accelerator
# type").  Scoped to the axon platform only: on real v4/v5p/v6e or
# multi-host pods these vars must stay unset so libtpu/the launcher
# auto-detects the true topology — and this module is imported on every
# KanConvND forward, not just when Pallas is enabled.
if "axon" in _os.environ.get("JAX_PLATFORMS", ""):
    _os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
    _os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    _os.environ.setdefault("TPU_WORKER_ID", "0")
