"""dsptpu — a TPU-native DSP framework (JAX/XLA/Pallas/pjit).

Capability parity target: JuliaDSP/DSP.jl (see SURVEY.md). Architecture:
  * design layer (host, float64 numpy): windows, filter design, remez,
    order estimation — produces coefficient arrays;
  * device layer (JAX/XLA + Pallas kernels): filt/conv/fftfilt,
    resample, periodograms/STFT, lpc, estimation — jit-compatible,
    batched over trailing channel dims;
  * parallel layer: jax.sharding mesh + shard_map halo exchange for
    multi-chip streams.
"""

from . import ops, utils
from .ops import windows
