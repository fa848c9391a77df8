"""Device mesh construction for multi-chip DSP streams.

The reference has no distributed layer (SURVEY.md §2.10); this one is
mandated by the TPU build: a 2-D ('channel', 'time') mesh where
'channel' carries embarrassingly-parallel trailing-dim channels (the
reference's per-column loops, dspbase.jl:55) and 'time' carries
block-decomposed sequence parallelism (the reference's overlap-save
block structure, dspbase.jl:490-609, promoted to a sharding axis).
Collectives ride ICI: ppermute halo exchange along 'time', psum for
spectral accumulation.
"""

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "default_mesh"]


def make_mesh(shape=None, axis_names=("channel", "time"), devices=None):
    """Build a Mesh over `devices` (default: all). `shape` defaults to
    (1, n_devices) — pure time-sharding."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def default_mesh():
    return make_mesh()
