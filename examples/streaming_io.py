"""Streaming IO example: C++ prefetching reader -> stateful filters.

The native double-buffered StreamReader (dsptpu/native/ringbuffer.cpp)
keeps chunks ahead of the consumer so disk/pipe IO overlaps device
compute; FIRFilter carries its streaming state across chunks, so the
chunked output is bit-compatible with filtering the whole file at once
(the reference's stateful-stream contract, stream_filt.jl:137-141).

Run: `python examples/streaming_io.py`
"""

import os
import tempfile
from fractions import Fraction

import numpy as np
import jax.numpy as jnp

import dsptpu
from dsptpu.native import StreamReader, native_available
from dsptpu.filters.stream_filt import FIRFilter

fs = 48_000.0
rng = np.random.default_rng(0)

# write a 4 s float32 PCM file
n = int(4 * fs)
t = np.arange(n) / fs
x = (np.sin(2 * np.pi * 1000.0 * t)
     + 0.1 * rng.standard_normal(n)).astype(np.float32)
path = os.path.join(tempfile.mkdtemp(), "stream.f32")
x.tofile(path)
print(f"native reader available: {native_available()}")

# design once (host), stream forever: 48 kHz -> 44.1 kHz
ratio = Fraction(147, 160)
h = np.asarray(dsptpu.resample_filter(ratio)).astype(np.float32)
sf = FIRFilter(h, ratio)

parts = []
with StreamReader(path, chunk=65_536 * 4) as sr:   # bytes per chunk
    for buf in sr:
        chunk = np.frombuffer(buf, np.float32)
        parts.append(np.asarray(sf.filt(jnp.asarray(chunk))))
y_stream = np.concatenate(parts)

# whole-file reference: identical output (streaming state contract)
sf2 = FIRFilter(h, ratio)
y_whole = np.asarray(sf2.filt(jnp.asarray(x)))
err = np.abs(y_stream - y_whole[: len(y_stream)]).max()
print(f"chunked == whole: max err {err:.2e} over {len(y_stream)} samples")
assert err < 2e-5

# spectral sanity: the 1 kHz tone survives resampling at 44.1 kHz
F = np.abs(np.fft.rfft(y_stream[: 1 << 16]))
peak = np.fft.rfftfreq(1 << 16, 1 / (fs * 147 / 160))[np.argmax(F)]
print(f"peak after 48k->44.1k resample: {peak:.1f} Hz (expect 1000)")
assert abs(peak - 1000.0) < 5
print("OK")
