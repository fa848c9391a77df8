import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is
# validated without TPU hardware) and with x64 enabled for float64
# parity against the reference fixtures. Must happen before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon (TPU) backend and the env
# pins JAX_PLATFORMS=axon; jax may already be imported by the time this
# runs, so force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the sharding/associative-scan tests are
# compile-heavy; cache compiled executables across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
