"""Multi-host execution helpers.

The reference is single-process Julia; dsptpu targets pod slices. On
real hardware every host runs the same program: call
`init_distributed()` first, build the global mesh with `global_mesh()`,
and the shard_map ops in parallel.ops run over ICI/DCN collectives
exactly as they do single-host (XLA inserts the cross-host transfers).

Without multi-host hardware, `simulate_hosts(n)` gives the same code
path on one machine: n virtual CPU devices stand in for n hosts'
chips (the driver's multichip dryrun and the test suite both use
this; BENCH weak-scaling mode launches separate processes instead so
per-"host" throughput is measured with real process isolation).
"""

import os

import numpy as np
import jax

__all__ = ["init_distributed", "global_mesh", "simulate_hosts",
           "weak_scaling_efficiency"]


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from explicit args or the standard
    environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or a cloud TPU metadata server). Safe to call when
    already initialized or single-process (returns False then)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _env_int("JAX_PROCESS_ID")
    if coordinator is None and num_processes is None:
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except RuntimeError:
        return False  # already initialized


def _env_int(name):
    v = os.environ.get(name)
    return None if v is None else int(v)


def global_mesh(time=None, channel=None):
    """Mesh over ALL processes' devices (jax.devices() is global after
    init_distributed). Defaults to a 1-D time mesh."""
    from .mesh import make_mesh
    devs = jax.devices()
    if time is None and channel is None:
        time = len(devs)
    return make_mesh(time=time, channel=channel)


def simulate_hosts(n):
    """Force n virtual CPU devices (must run before jax is used).
    Returns True if the flag was applied in time."""
    flags = os.environ.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n}"
    if want not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return len(jax.devices()) == n


def weak_scaling_efficiency(rates):
    """rates: {n_hosts: samples_per_s_aggregate}. Efficiency of the
    largest configuration vs linear scaling from the smallest."""
    ns = sorted(rates)
    base = rates[ns[0]] / ns[0]
    return {n: rates[n] / (n * base) for n in ns}
