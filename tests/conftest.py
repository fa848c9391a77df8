import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is
# validated without TPU hardware) and with x64 enabled for float64
# parity against the reference fixtures. Must happen before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
