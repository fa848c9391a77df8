"""Benchmark harness: BASELINE.json configs on the attached device.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N}

value = geometric mean of filtered samples/s/chip over the BASELINE
configs (FIR, overlap-save, Welch/spectrogram, polyphase resample,
IIR filtfilt). vs_baseline = ratio against the same workloads run via
scipy.signal on this host's CPU (the reference publishes no numbers —
BASELINE.md), measured on a subsampled workload and scaled.
Per-config detail goes to stderr.
"""

import json
import math
import sys
import time
from fractions import Fraction

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


_LATENCY = 0.0


def _timeit(fn, *args, reps=3, warmup=1, k=8):
    """Times fn via a scalar host readback. On a tunneled TPU,
    block_until_ready can return before the computation completes, so
    we sync with a one-element host read; and a single call is
    dominated by the ~50 ms dispatch+readback latency, so each
    measurement dispatches `k` back-to-back calls (device executes
    in-order) with one final sync and amortizes the latency."""
    for _ in range(warmup):
        _sync(fn(*args))
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        _sync(r)
        t = (time.perf_counter() - t0 - _LATENCY) / k
        best = min(best, t)
    return max(best, 50e-6)


def _sync(r):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(r)
    for leaf in leaves:
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    # force true completion with a host readback of one element
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            np.asarray(jnp.ravel(leaf)[-1])


def _measure_latency():
    import jax
    import jax.numpy as jnp
    triv = jax.jit(lambda a: jnp.sum(a))
    x = jnp.ones(8, jnp.float32)
    _sync(triv(x))
    best = math.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(triv(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import dsptpu
    from dsptpu.filters import stream_filt
    from scipy import signal as sp

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)
    _log(f"device: {dev} (platform {dev.platform})")
    global _LATENCY
    _LATENCY = _measure_latency()
    _log(f"dispatch+readback latency: {_LATENCY*1e3:.1f} ms (subtracted)")
    dtype = np.float32
    scale = 1 if on_tpu else 4  # shrink workloads on CPU fallback

    rng = np.random.default_rng(1776)
    results = {}
    ratios = {}

    HBM_BW = 819e9  # TPU v5e HBM bandwidth, bytes/s

    def bench_pair(name, nsamples, dev_fn, dev_args, cpu_fn, cpu_args,
                   cpu_frac=8, min_bytes=None):
        t_dev = _timeit(dev_fn, *dev_args)
        sps = nsamples / t_dev
        # scipy baseline on 1/cpu_frac of the data, extrapolated
        t0 = time.perf_counter()
        cpu_fn(*cpu_args)
        t_cpu = (time.perf_counter() - t0) * cpu_frac
        results[name] = sps
        ratios[name] = sps / (nsamples / t_cpu)
        roof = ""
        if min_bytes is not None and on_tpu:
            # fraction of the HBM-bandwidth roofline, using the
            # minimum possible traffic (read input + write output)
            frac = (min_bytes / t_dev) / HBM_BW
            roof = f", {100*frac:.0f}% of HBM roofline"
        _log(f"{name}: {sps/1e6:.1f} MS/s  (vs scipy x{ratios[name]:.1f}"
             f"{roof})")

    # -- config 1: 127-tap FIR, 1M samples, single channel ------------------
    n = 10_000_000 // scale
    h = sp.firwin(127, 0.25).astype(dtype)
    x = (np.sin(2 * np.pi * 0.01 * np.arange(n))
         + 0.1 * rng.standard_normal(n)).astype(dtype)
    xj, hj = jnp.asarray(x), jnp.asarray(h)
    fir = jax.jit(lambda b, s: dsptpu.filt(b, s))
    bench_pair("fir_127tap", n, fir, (hj, xj),
               lambda: sp.lfilter(h, [1.0], x[: n // 8]), (), 8,
               min_bytes=2 * 4 * n)

    # -- config 2: overlap-save 4096-tap FIR, 16ch x 10M --------------------
    nch, n2 = 16, 10_000_000 // (scale * 4 if not on_tpu else 1)
    h2 = sp.firwin(4096, 0.1).astype(dtype)
    x2 = rng.standard_normal((n2, nch)).astype(dtype)
    x2j, h2j = jnp.asarray(x2), jnp.asarray(h2)
    osf = jax.jit(lambda b, s: dsptpu.fftfilt(b, s))
    bench_pair("os_4096tap_16ch", n2 * nch, osf, (h2j, x2j),
               lambda: sp.oaconvolve(x2[: n2 // 16], h2[:, None],
                                     axes=0), (), 16,
               min_bytes=2 * 4 * n2 * nch)

    # -- config 3: welch + spectrogram, nfft=1024, 50% ovl, 64ch ------------
    nch3, n3 = 64, 1_000_000 // scale
    x3 = rng.standard_normal((n3, nch3)).astype(dtype)
    x3j = jnp.asarray(x3)
    win = np.asarray(dsptpu.windows.hanning(1024)).astype(dtype)

    def welch_dev(s):
        p = dsptpu.welch_pgram(s, 1024, 512, window=win)
        return dsptpu.power(p)

    welch_j = jax.jit(welch_dev)
    bench_pair("welch_1024_64ch", n3 * nch3, welch_j, (x3j,),
               lambda: sp.welch(x3[: n3 // 8], axis=0, nperseg=1024,
                                noverlap=512, window=win), (), 8,
               min_bytes=4 * n3 * nch3)

    # -- config 4: polyphase rational resample 147//160 ---------------------
    n4 = 10_000_000 // scale
    x4 = rng.standard_normal(n4).astype(dtype)
    ratio = Fraction(147, 160)
    h4 = np.asarray(dsptpu.resample_filter(ratio)).astype(dtype)
    sf = stream_filt.FIRFilter(h4, ratio)
    x4j = jnp.asarray(x4)

    def poly_dev(xc):
        sf.reset()
        return sf.filt(xc)

    bench_pair("resample_147_160", n4, poly_dev, (x4j,),
               lambda: sp.resample_poly(x4[: n4 // 8], 147, 160), (), 8,
               min_bytes=int(4 * n4 * (1 + 147 / 160)))

    # -- config 5: IIR filtfilt, 8th-order butterworth SOS ------------------
    n5 = 1_000_000 // scale
    x5 = rng.standard_normal(n5).astype(dtype)
    f5 = dsptpu.filters.as_sos(
        dsptpu.digitalfilter(dsptpu.Lowpass(0.2), dsptpu.Butterworth(8)))
    sos_arr = f5.sos_array()
    sos_sp = np.column_stack([sos_arr[:, :3],
                              np.ones((sos_arr.shape[0], 1)),
                              sos_arr[:, 3:]])
    x5j = jnp.asarray(x5)
    ff = jax.jit(lambda s: dsptpu.filtfilt(f5, s))
    bench_pair("filtfilt_sos8", n5, ff, (x5j,),
               lambda: sp.sosfiltfilt(sos_sp, x5[: n5 // 8]), (), 8,
               min_bytes=4 * 4 * n5)

    # -- headline ------------------------------------------------------------
    geo = math.exp(sum(math.log(v) for v in results.values())
                   / len(results))
    geo_ratio = math.exp(sum(math.log(v) for v in ratios.values())
                         / len(ratios))
    print(json.dumps({
        "metric": "filtered samples/s/chip (geomean: FIR, overlap-save, "
                  "Welch, polyphase resample, filtfilt)",
        "value": round(geo, 1),
        "unit": "samples/s",
        "vs_baseline": round(geo_ratio, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
