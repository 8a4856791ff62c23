import os

# Hard override: the session environment pre-sets JAX_PLATFORMS=axon (the
# remote-TPU tunnel), where eager per-op dispatch is network-bound.  Unit
# tests always run on a virtual 8-device CPU mesh.
#
# NOTE: a sitecustomize hook imports jax at interpreter start, so env vars
# may be too late for backend *registration*, but backend *selection* and
# device count are decided at first use — the config updates below run
# before any test touches jax.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Golden parity tests run in float64 to prove exact semantic equivalence
# with the reference (fp32 would only show conv summation-order noise).
jax.config.update("jax_enable_x64", True)
