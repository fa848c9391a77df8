"""Tracing/profiling + roofline accounting helpers (SURVEY.md §5).

The reference library has no profiling subsystem; production TPU
deployment needs one. This wraps jax.profiler (XLA trace collection,
viewable in TensorBoard/Perfetto) and provides the roofline model used
by bench.py so kernel efficiency is measurable anywhere, not just in
the benchmark.
"""

import contextlib
import math
import time

import numpy as np

__all__ = ["trace", "annotate", "Roofline", "measure"]

# TPU v5e single-chip peaks (the deployment target; override for other
# generations via Roofline(...)).
V5E_HBM_BW = 819e9       # bytes/s
V5E_BF16_FLOPS = 197e12  # MXU bf16 FLOP/s
F32_PASSES = 6           # HIGHEST-precision f32 matmul = 6 bf16 passes


@contextlib.contextmanager
def trace(logdir):
    """Collect an XLA profiler trace into `logdir` (open with
    TensorBoard's profile plugin or Perfetto)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up in profiler traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class Roofline:
    """Roofline accounting for one kernel/op invocation."""

    def __init__(self, hbm_bw=V5E_HBM_BW, peak_flops=V5E_BF16_FLOPS,
                 f32_passes=F32_PASSES):
        self.hbm_bw = hbm_bw
        self.peak_flops = peak_flops
        self.f32_passes = f32_passes

    def fractions(self, seconds, min_bytes=None, flops=None,
                  precision="highest"):
        """Achieved fraction of the HBM and MXU rooflines.
        `flops` counts useful f32 matmul FLOPs; precision scales the
        MXU peak by the pass count (highest=6, high=3, default=1)."""
        passes = {"highest": self.f32_passes, "high": 3,
                  "default": 1}[precision]
        out = {}
        if min_bytes is not None:
            out["hbm_frac"] = (min_bytes / seconds) / self.hbm_bw
        if flops is not None:
            out["mxu_frac"] = (flops / seconds) / (self.peak_flops / passes)
            out["tflops"] = flops / seconds / 1e12
        return out


def measure(fn, *args, reps=3, k=8, latency=0.0):
    """Best-of-reps wall time of `fn(*args)` with k chained dispatches
    and a host readback sync (the only reliable sync over a tunneled
    device), minus `latency` per chain."""
    import jax
    import jax.numpy as jnp

    def sync(r):
        for leaf in jax.tree_util.tree_leaves(r):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        for leaf in jax.tree_util.tree_leaves(r):
            if hasattr(leaf, "shape"):
                np.asarray(jnp.ravel(leaf)[-1])
                break

    sync(fn(*args))
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        sync(r)
        best = min(best, (time.perf_counter() - t0 - latency) / k)
    return max(best, 1e-9)
