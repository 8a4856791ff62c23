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
# Persistent compile cache: the suite is compile-bound on 1 CPU (measured
# 43s -> 16s for the L1-wrapper tests on a warm cache); repeat CI runs on
# the same host reuse /tmp artifacts across processes.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/convkan_jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Golden parity tests run in float64 to prove exact semantic equivalence
# with the reference (fp32 would only show conv summation-order noise).
jax.config.update("jax_enable_x64", True)
