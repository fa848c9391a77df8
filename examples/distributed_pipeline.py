"""Distributed example: the same DSP pipeline sharded over a device
mesh.

DSP.jl has no distributed layer (SURVEY.md section 2.10) — this is the
TPU-native extension: one `jax.sharding.Mesh` over ('channel', 'time'),
`shard_map`-based ops exchanging FIR/OS halos with `ppermute`, chaining
IIR state with a log-depth affine prefix, and reducing Welch with
`psum`. Every sharded op matches its single-device counterpart exactly
(see tests/test_parallel.py).

Run anywhere: `XLA_FLAGS=--xla_force_host_platform_device_count=8 \
JAX_PLATFORMS=cpu python examples/distributed_pipeline.py`
(on a real pod, build the mesh from jax.devices() as usual).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import dsptpu
from dsptpu.parallel import (make_mesh, shard_fir, shard_sosfilt,
                             shard_filtfilt, shard_welch,
                             shard_spectrogram)

fs = 48_000.0
rng = np.random.default_rng(0)

devs = np.array(jax.devices())
n_dev = devs.size
# 2-D mesh: channels x time-blocks (use every device; at 8 devices
# this is 2 channel groups x 4 time shards)
ch = 2 if n_dev % 2 == 0 else 1
mesh = make_mesh((ch, n_dev // ch), ("channel", "time"))
print(f"mesh: {mesh.shape}")

# 64-channel stream, ~1M samples/channel
nch, n = 8, 262_144
t = np.arange(n) / fs
x = (np.sin(2 * np.pi * 440.0 * t)[:, None]
     + 0.1 * rng.standard_normal((n, nch))).astype(np.float32)

# --- FIR bandpass, time+channel sharded ------------------------------
b = np.asarray(dsptpu.digitalfilter(
    dsptpu.Bandpass(2 * 300.0 / fs, 2 * 3000.0 / fs),
    dsptpu.FIRWindow(dsptpu.windows.hamming(255)))).astype(np.float32)
y = shard_fir(jnp.asarray(b), x, mesh, time_axis="time",
              channel_axis="channel")
print("shard_fir:", y.shape)

# --- IIR (SOS cascade) with cross-shard state chaining ----------------
f = dsptpu.digitalfilter(dsptpu.Lowpass(2 * 4000.0 / fs),
                         dsptpu.Butterworth(6))
fsos = dsptpu.filters.as_sos(f)
sos, g = dsptpu.filters.sos_arrays(fsos)
y2 = shard_sosfilt(sos, g, np.asarray(y), mesh, time_axis="time",
                   channel_axis="channel")
print("shard_sosfilt:", y2.shape)

# --- zero-phase filtering, both passes shard-local --------------------
y3 = shard_filtfilt(sos, g, np.asarray(y2), mesh, time_axis="time",
                    channel_axis="channel")
print("shard_filtfilt:", y3.shape)

# --- Welch PSD: segment-parallel with psum ----------------------------
win = np.asarray(dsptpu.windows.hanning(1024)).astype(np.float32)
psd, freqs = shard_welch(np.asarray(y3), 1024, 512, win, mesh,
                         time_axis="time", channel_axis="channel",
                         fs=fs)
peak = freqs[int(np.argmax(np.asarray(psd).mean(axis=-1)))]
print(f"shard_welch: {np.asarray(psd).shape}, peak at {peak:.0f} Hz "
      "(expect 440)")

# --- sharded spectrogram (segments stay sharded over time) ------------
pw, _, _ = shard_spectrogram(x, 1024, 512, win, mesh,
                             channel_axis="channel")
print("shard_spectrogram:", np.asarray(pw).shape)

# --- correctness vs single-device -------------------------------------
y_ref = dsptpu.filt(jnp.asarray(b), jnp.asarray(x))
y_ref = dsptpu.sosfilt(fsos, y_ref)
y_ref = dsptpu.filtfilt(fsos, x=y_ref)
ref = dsptpu.power(dsptpu.welch_pgram(y_ref, 1024, 512,
                                      window=jnp.asarray(win), fs=fs))
err = float(np.max(np.abs(np.asarray(psd) - np.asarray(ref))))
print(f"max |sharded - single-device| = {err:.2e}")
assert err < 1e-4 * float(np.max(np.asarray(ref)))
print("OK — sharded pipeline matches the single-device computation")
