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
#
# The cache key includes a fingerprint of the host's CPU features:
# XLA:CPU serializes AOT machine code, and loading an entry compiled on a
# different machine type is undefined behavior — observed as
# "Fatal Python error: Aborted" mid-suite when /tmp survived a VM
# migration (cpu_aot_loader.cc then warns "could lead to execution
# errors such as SIGILL").  A host change now lands in a fresh cache dir.


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = sorted(
                {ln.split(":", 1)[1].strip() for ln in f
                 if ln.startswith("flags")})
        return hashlib.sha1("".join(flags).encode()).hexdigest()[:12]
    except OSError:
        return "nohost"


jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 f"/tmp/convkan_jax_test_cache_"
                                 f"{_cpu_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Golden parity tests run in float64 to prove exact semantic equivalence
# with the reference (fp32 would only show conv summation-order noise).
jax.config.update("jax_enable_x64", True)
