"""Pallas TPU kernels for the hot KAN ops (with jnp reference paths)."""

import os as _os

# The Mosaic remote compile helper in this environment needs the TPU
# topology hints in the forwarded env or libtpu fails to initialize
# ("could not determine TPU accelerator type").  Defaults only — explicit
# user settings win.
_os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
_os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
_os.environ.setdefault("TPU_WORKER_ID", "0")
