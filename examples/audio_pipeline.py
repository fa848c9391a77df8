"""End-to-end example: a DSP.jl user's workflow on dsptpu.

Mirrors the canonical DSP.jl snippets (docs/src/index.md and the
filters/periodograms doc pages); every step names the DSP.jl call it
replaces. Run on CPU or TPU: `python examples/audio_pipeline.py`.
"""

from fractions import Fraction

import numpy as np
import jax.numpy as jnp

import dsptpu

fs = 48_000.0
rng = np.random.default_rng(0)

# a noisy two-tone test signal, 2 s at 48 kHz
t = np.arange(int(2 * fs)) / fs
x = (np.sin(2 * np.pi * 440.0 * t) + 0.5 * np.sin(2 * np.pi * 9000.0 * t)
     + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
xj = jnp.asarray(x)

# --- IIR design + zero-phase filtering -------------------------------
# DSP.jl: f = digitalfilter(Lowpass(2000; fs), Butterworth(8));
#         y = filtfilt(f, x)
f = dsptpu.digitalfilter(dsptpu.Lowpass(2 * 2000.0 / fs),
                         dsptpu.Butterworth(8))
y = dsptpu.filtfilt(f, xj)
print("filtfilt:", y.shape, "9 kHz tone attenuated:",
      float(jnp.std(y)) < float(jnp.std(xj)))

# --- FIR design + streaming filtering --------------------------------
# DSP.jl: h = digitalfilter(Lowpass(0.25), FIRWindow(hamming(127)));
#         filt(h, x) / FIRFilter for streaming
h = dsptpu.digitalfilter(
    dsptpu.Lowpass(0.25),
    dsptpu.FIRWindow.create(np.asarray(dsptpu.windows.hamming(127))))
sf = dsptpu.FIRFilter(np.asarray(h, np.float32))
chunks = [np.asarray(sf.filt(xj[i:i + 16384]))
          for i in range(0, x.size, 16384)]
y_stream = np.concatenate(chunks)
y_once = np.asarray(dsptpu.filt(jnp.asarray(np.asarray(h, np.float32)),
                                xj))
print("streaming == one-shot:",
      np.allclose(y_stream, y_once, atol=1e-4))

# --- rational resampling 48 kHz -> 44.1 kHz --------------------------
# DSP.jl: resample(x, 147//160)
z = dsptpu.resample(y, Fraction(147, 160))
print("resample:", x.size, "->", z.shape[0], "samples")

# --- spectral analysis ------------------------------------------------
# DSP.jl: welch_pgram(x, 1024, 512; window=hanning, fs),
#         spectrogram(x, 1024, 512; window=hanning, fs)
win = np.asarray(dsptpu.windows.hanning(1024)).astype(np.float32)
p = dsptpu.welch_pgram(y, 1024, 512, window=win, fs=fs)
peak = float(np.asarray(dsptpu.freq(p))[int(np.argmax(
    np.asarray(dsptpu.power(p))))])
print(f"welch peak at {peak:.0f} Hz (expect ~440)")

sg = dsptpu.spectrogram(y, 1024, 512, window=win, fs=fs)
print("spectrogram:", np.asarray(dsptpu.power(sg)).shape,
      "times", np.asarray(dsptpu.time(sg))[:2], "...")

# --- LPC on speech-style frames ---------------------------------------
# DSP.jl: lpc(frame, 16, LPCLevinson())
frames = np.asarray(y[: (y.shape[0] // 400) * 400]).reshape(-1, 400).T
a, err = dsptpu.lpc(jnp.asarray(frames), 16, dsptpu.LPCLevinson())
print("lpc coefficients per frame:", np.asarray(a).shape)

print("pipeline OK")
