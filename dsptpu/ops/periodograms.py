"""Spectral estimation: periodogram / Welch / spectrogram / STFT.

Capability parity with reference src/periodograms.jl (ArraySplit :32-137,
fft2pow :142-244, periodogram 1-D :393-417 and 2-D :473-509, WelchConfig
:516-580, welch_pgram :647-759, spectrogram/stft :828-897).

TPU-first redesign: the reference walks segments one at a time through a
preallocated FFTW plan (periodograms.jl:746-759). Here segmentation is a
single strided gather producing a (segments, nfft) batch, the window
multiply broadcasts, and ONE batched rFFT handles every segment — XLA
fuses gather+window+scale, and the segment axis is also the natural
sharding axis for multi-chip Welch (psum of per-segment PSDs).

Extension over the reference: all 1-D entry points accept trailing
channel dims (batched along the lane dimension on TPU).
"""

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.fftutil import nextfastfft, fftintype
from . import windows as _windows

__all__ = [
    "arraysplit", "periodogram", "welch_pgram", "spectrogram", "stft",
    "WelchConfig", "Periodogram", "Periodogram2", "Spectrogram",
    "power", "freq", "tfr_time", "fftshift_tfr",
]


# ---------------------------------------------------------------------------
# result containers
# ---------------------------------------------------------------------------

@dataclass
class Periodogram:
    """PSD result: `power` (nbins, *chans), `freq` (nbins,) numpy axis
    (reference periodograms.jl:270-282)."""
    power: Any
    freq: Any


@dataclass
class Periodogram2:
    """2-D PSD result (reference periodograms.jl:284-289)."""
    power: Any
    freq1: Any
    freq2: Any


@dataclass
class Spectrogram:
    """Time-frequency PSD: `power` (nbins, nsegments, *chans), `freq`,
    `time` (reference periodograms.jl:773-780)."""
    power: Any
    freq: Any
    time: Any


def power(p):
    return p.power


def freq(p):
    if isinstance(p, Periodogram2):
        return (p.freq1, p.freq2)
    return p.freq


def tfr_time(p):
    return p.time


def fftshift_tfr(p):
    """fftshift a two-sided TFR's frequency axis (reference
    periodograms.jl:331-339,777-780)."""
    def is_twosided(f):
        return np.any(np.asarray(f) < 0)

    if isinstance(p, Periodogram):
        if not is_twosided(p.freq):
            return p
        return Periodogram(jnp.fft.fftshift(p.power, axes=0), np.fft.fftshift(p.freq))
    if isinstance(p, Spectrogram):
        if not is_twosided(p.freq):
            return p
        return Spectrogram(jnp.fft.fftshift(p.power, axes=0),
                           np.fft.fftshift(p.freq), p.time)
    if isinstance(p, Periodogram2):
        pw = p.power
        f1, f2 = p.freq1, p.freq2
        if is_twosided(f1):
            pw = jnp.fft.fftshift(pw, axes=0)
            f1 = np.fft.fftshift(f1)
        if is_twosided(f2):
            pw = jnp.fft.fftshift(pw, axes=1)
            f2 = np.fft.fftshift(f2)
        return Periodogram2(pw, f1, f2)
    raise TypeError(f"cannot fftshift {type(p)}")


# ---------------------------------------------------------------------------
# segmentation + window plumbing
# ---------------------------------------------------------------------------

def _num_segments(length, n, noverlap):
    if not 0 <= noverlap < n:
        raise ValueError("noverlap must be between zero and n")
    return (length - n) // (n - noverlap) + 1 if length >= n else 0


def arraysplit(s, n, noverlap, nfft=None, window=None):
    """Split signal into overlapping (optionally windowed, zero-padded to
    nfft) segments, as a (k, nfft, *chans) batch. Functional equivalent of
    the reference's lazy ArraySplit (periodograms.jl:32-137); materialized
    as one gather because the batch IS the efficient device layout."""
    s = jnp.asarray(s)
    n = int(n)
    nfft = n if nfft is None else int(nfft)
    if nfft < n:
        raise ValueError("nfft must be >= n")
    k = _num_segments(s.shape[0], n, noverlap)
    hop = n - noverlap
    # overlapped frames from shifted strided reshapes (gathers cost
    # ~20x on TPU); part j covers frame offsets [j*hop, (j+1)*hop)
    q = -(-n // hop)
    need = (k + q) * hop
    sp = s if s.shape[0] >= need else jnp.pad(
        s, [(0, need - s.shape[0])] + [(0, 0)] * (s.ndim - 1))
    parts = [sp[j * hop: (k + j) * hop].reshape((k, hop) + s.shape[1:])
             for j in range(q)]
    frames = jnp.concatenate(parts, axis=1)[:, :n]  # (k, n, *chans)
    if window is not None:
        win = _resolve_window(window, n)[0]
        frames = frames * jnp.asarray(win).reshape((1, n) + (1,) * (s.ndim - 1))
    if nfft > n:
        pad = [(0, 0), (0, nfft - n)] + [(0, 0)] * (s.ndim - 1)
        frames = jnp.pad(frames, pad)
    return frames


def _resolve_window(window, n):
    """window may be None, a callable (n -> array), or an array.
    Returns (window or None, squared L2 norm) (reference
    periodograms.jl:248-257)."""
    if window is None:
        return None, float(n)
    if callable(window):
        win = np.asarray(window(n), dtype=np.float64)
    else:
        win = np.asarray(window, dtype=np.float64)
        if win.shape[0] != n:
            raise ValueError("length of window must match input")
    return win, float(np.sum(win ** 2))


def _psd_from_rfft(F, nfft, r, onesided, twosided_from_rfft):
    """|F|^2 / r with one/two-sided bin bookkeeping (reference
    fft2pow!, periodograms.jl:142-172). F: (..., nbins, *chans) rfft or
    fft output with the frequency axis at `axis`=-1-ish; here we fix the
    convention: frequency axis is axis -1 of the leading block, i.e. F
    has shape (k, nbins, *chans) and we reduce nothing."""
    mag = jnp.abs(F) ** 2
    nbins = F.shape[1]
    ch_shape = (1,) * (F.ndim - 2)
    if onesided:
        w = np.full(nbins, 2.0)
        w[0] = 1.0
        if nfft % 2 == 0:
            w[-1] = 1.0
        return mag * jnp.asarray(w / r).reshape((1, nbins) + ch_shape)
    if not twosided_from_rfft:
        return mag / r
    # mirror rfft bins into a full two-sided spectrum
    if nfft % 2 == 0:
        tail = mag[:, -2:0:-1]
    else:
        tail = mag[:, -1:0:-1]
    return jnp.concatenate([mag, tail], axis=1) / r


def _fft_segments(frames, nfft, is_real):
    if is_real:
        return jnp.fft.rfft(frames, n=nfft, axis=1)
    return jnp.fft.fft(frames, n=nfft, axis=1)


# ---------------------------------------------------------------------------
# fused Pallas segment-DFT path (TPU)
# ---------------------------------------------------------------------------
#
# On TPU the windowed-segment pipeline runs as ONE Pallas kernel
# (kernels/stft.py): framing DMA + window + four-step MXU DFT + |.|^2
# (+ Welch accumulation) fused over HBM. Enabled by default on
# non-CPU backends for supported geometries; DSPTPU_NO_PALLAS=1
# disables, DSPTPU_PALLAS=1 forces (uses interpret mode off-TPU).

import os as _os
_PALLAS_STFT = {"0": False, "1": True}.get(
    _os.environ.get("DSPTPU_PALLAS", ""), None)
if _os.environ.get("DSPTPU_NO_PALLAS", "") == "1":
    _PALLAS_STFT = False


def _pallas_stft_ok(s, n, nfft, hop):
    if _PALLAS_STFT is False:
        return False
    if jnp.iscomplexobj(s) or s.dtype != jnp.float32:
        return False
    from ..kernels.stft import stft_supported
    if not (stft_supported(nfft, hop, s.dtype) and n <= nfft):
        return False
    if _PALLAS_STFT is True:
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _pallas_seg_pow(s, n, noverlap, nfft, win, accumulate,
                    onesided=False):
    """Per-frame (or frame-summed) |DFT|^2 via the fused kernel.
    s: (len, *chans); returns (k, nbins, *chans) powers or, when
    accumulate, (nbins, *chans) frame sums — nbins = nfft//2+1 in the
    one-sided accumulate mode (the kernel skips the mirrored half),
    else nfft."""
    from ..kernels.stft import (stft_pow_pallas, bins_from_tile,
                                onesided_bins_from_tile)
    hop = n - noverlap
    k = _num_segments(s.shape[0], n, noverlap)
    flat = s.reshape(s.shape[0], -1)                  # (len, C)
    wext = np.zeros(nfft)
    wext[:n] = np.asarray(win) if win is not None else 1.0
    try:
        interp = jax.devices()[0].platform in ("cpu",)
    except Exception:
        interp = True
    tile = stft_pow_pallas(flat, wext, nfft, hop, k,
                           accumulate=accumulate,
                           onesided=onesided, interpret=interp)
    if accumulate:
        nb = nfft // 2 + 1 if onesided else nfft
        pw = (onesided_bins_from_tile(tile, nfft, nb) if onesided
              else bins_from_tile(tile, nfft, nb))
        return jnp.moveaxis(pw, 0, -1).reshape((nb,) + s.shape[1:])
    pw = bins_from_tile(tile, nfft, nfft)             # (C, k, nfft)
    out = jnp.moveaxis(pw, 0, -1)                     # (k, nfft, C)
    return out.reshape((k, nfft) + s.shape[1:])


def _pallas_spectro_pow(s, n, noverlap, nfft, win, r, onesided):
    """PSD-mode STFT straight to the final (nbins, k, *chans) layout
    with ONE transpose after the fused kernel (the generic
    _pallas_seg_pow -> bins_from_tile -> moveaxis -> weight -> swapaxes
    chain pays 4 full-size HBM copies; measured 15 ms for the 64ch/1M
    bench spectrogram vs 6 ms for Welch on the same data). Raw
    (C, nblocks, N1, TB, 128) blocks are lane-sliced first — bin
    k = k1 + N1*k2 < nbins only needs k2 <= (nbins-1)//N1 — then
    permuted once to (k2, k1, blocks, TB, C), where flattening
    (k2, k1) yields bin order and (blocks, TB) yields frame order."""
    from ..kernels.stft import stft_pow_pallas
    hop = n - noverlap
    k = _num_segments(s.shape[0], n, noverlap)
    flat = s.reshape(s.shape[0], -1)
    wext = np.zeros(nfft)
    wext[:n] = np.asarray(win) if win is not None else 1.0
    try:
        interp = jax.devices()[0].platform in ("cpu",)
    except Exception:
        interp = True
    tile = stft_pow_pallas(flat, wext, nfft, hop, k, accumulate=False,
                           raw=True, interpret=interp)
    C, nblocks, N1, TB, _ = tile.shape
    nbins = nfft // 2 + 1 if onesided else nfft
    l2 = (nbins - 1) // N1 + 1
    # (a pallas permute of this epilogue measured NO win at
    # VMEM-fitting tile sizes — kernels/transpose.spectro_permute_pallas
    # records the negative result)
    pw = jnp.transpose(tile[..., :l2], (4, 2, 1, 3, 0))
    pw = pw.reshape(l2 * N1, nblocks * TB, C)[:nbins, :k]
    wts = _psd_weights(nfft, r, onesided)
    out = pw * jnp.asarray(wts, pw.dtype)[:, None, None]
    return out.reshape((nbins, k) + s.shape[1:])


def _psd_weights(nfft, r, onesided, dtype=None):
    """One/two-sided PSD bin weights (fft2pow bookkeeping,
    periodograms.jl:142-172) applied to full-spectrum |X|^2 bins."""
    nbins = nfft // 2 + 1 if onesided else nfft
    w = np.full(nbins, 1.0 / r)
    if onesided:
        w[1:] *= 2.0
        if nfft % 2 == 0:
            w[-1] /= 2.0
    return w


# ---------------------------------------------------------------------------
# periodogram (1-D and 2-D)
# ---------------------------------------------------------------------------

def periodogram(s, onesided=None, nfft=None, fs=1.0, window=None,
                radialsum=False, radialavg=False):
    """Periodogram of a 1-D signal (reference periodograms.jl:393-417)
    or a 2-D signal / radial variants (reference periodograms.jl:473-509).
    1-D signals may carry trailing channel dims (TPU extension)."""
    s = jnp.asarray(s)
    if s.dtype != fftintype(s.dtype):
        s = s.astype(fftintype(s.dtype))
    if s.ndim == 2:
        # matrix input = 2-D periodogram (reference periodograms.jl:473-509)
        if radialsum and radialavg:
            raise ValueError("radialsum and radialavg are mutually exclusive")
        ptype = 1 if radialsum else (2 if radialavg else 0)
        nfft2 = nfft if isinstance(nfft, tuple) else \
            tuple(nextfastfft(d) for d in s.shape)
        return _periodogram2(s, nfft2, fs, ptype)
    if radialsum or radialavg:
        raise ValueError("radial periodograms require a 2-D input")

    is_real = not jnp.iscomplexobj(s)
    if onesided is None:
        onesided = is_real
    if onesided and not is_real:
        raise ValueError("cannot compute one-sided FFT of a complex signal")
    n = s.shape[0]
    nfft = nextfastfft(n) if nfft is None else int(nfft)
    if nfft < n:
        raise ValueError("nfft must be >= length(s)")

    win, norm2 = _resolve_window(window, n)
    if win is not None:
        s = s * jnp.asarray(win).reshape((n,) + (1,) * (s.ndim - 1))
    F = _fft_segments(s[None], nfft, is_real)
    pw = _psd_from_rfft(F, nfft, fs * norm2, onesided,
                        twosided_from_rfft=is_real)[0]
    f = np.fft.rfftfreq(nfft, 1 / fs) if onesided else np.fft.fftfreq(nfft, 1 / fs)
    return Periodogram(pw, f)


def _periodogram2(s, nfft, fs, ptype):
    """Full 2-D PSD (ptype 0) or radial sum/average (1/2)
    (reference periodograms.jl:473-509, fft2pow2radial! :183-232)."""
    if s.ndim != 2:
        raise ValueError("2-D periodogram requires a matrix")
    n1s, n2s = s.shape
    if n1s <= 1 or n2s <= 1:
        raise ValueError("dimensions of s must be > 1")
    n1, n2 = nfft
    if n1s > n1 or n2s > n2:
        raise ValueError("nfft must be >= size(s)")
    norm2 = s.size
    r = fs * norm2

    if ptype == 0:
        F = jnp.fft.fftn(s, s=(n1, n2))
        pw = jnp.abs(F) ** 2 / r
        return Periodogram2(pw, np.fft.fftfreq(n1, 1 / fs),
                            np.fft.fftfreq(n2, 1 / fs))

    F = jnp.fft.fft(jnp.fft.rfft(s, n=n1, axis=0), n=n2, axis=1)
    mag = jnp.abs(F) ** 2
    nmin = min(n1, n2)
    kmax = nmin // 2 + 1
    n1max = n1 // 2 + 1
    # wavenumber of each (i, j) bin, scaled for non-square inputs
    c1, c2 = (n2 / n1, 1.0) if n1 != nmin else (1.0, n1 / n2)
    i = np.arange(n1max)[:, None]
    j = np.arange(n2)[None, :]
    kj1 = np.where(j <= n2 // 2, j, j - n2).astype(np.float64)
    wavenum = np.round(np.sqrt((c1 * i) ** 2 + (c2 * kj1) ** 2)).astype(np.int64)
    # doubling weights for the implicit negative-freq half of the rfft axis
    wt = np.full((n1max, n2), 2.0)
    wt[0, :] = 1.0
    wt[-1, :] = 1.0 if n1 % 2 == 0 else 2.0
    valid = wavenum < kmax
    seg = np.where(valid, wavenum, kmax)  # overflow bucket
    flat = (mag * jnp.asarray(wt)).reshape(-1)
    sums = jax.ops.segment_sum(flat, jnp.asarray(seg.reshape(-1)),
                               num_segments=kmax + 1)[:kmax] / r
    if ptype == 2:
        counts = np.zeros(kmax + 1)
        np.add.at(counts, seg.reshape(-1), wt.reshape(-1))
        sums = sums / jnp.asarray(np.maximum(counts[:kmax], 1.0))
    f = np.arange(kmax) * (fs / nmin)
    return Periodogram(sums, f)


# ---------------------------------------------------------------------------
# Welch
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WelchConfig:
    """Static Welch plan: hashable, so each distinct config compiles one
    XLA program (the TPU analogue of the reference's FFTW plan+buffer
    struct, periodograms.jl:516-580)."""
    nsamples: int
    noverlap: int
    onesided: bool
    nfft: int
    fs: float
    window: Optional[tuple]  # window samples as a hashable tuple, or None

    @staticmethod
    def create(nsamples=None, n=None, noverlap=None, onesided=True,
               nfft=None, fs=1.0, window=None, data=None):
        if data is not None:
            nsamples = np.asarray(data).shape[0]
        n = nsamples >> 3 if n is None else int(n)
        noverlap = n >> 1 if noverlap is None else int(noverlap)
        nfft = nextfastfft(n) if nfft is None else int(nfft)
        if nfft < n:
            raise ValueError("nfft must be >= n")
        if isinstance(window, str) and window == "hanning":
            window = _windows.hanning
        win, _ = _resolve_window(window, n)
        return WelchConfig(n, noverlap, onesided, nfft, float(fs),
                           None if win is None else tuple(win.tolist()))


def welch_pgram(s, n=None, noverlap=None, onesided=None, nfft=None, fs=1.0,
                window=None, config=None):
    """Welch PSD estimate over overlapping windowed segments (reference
    periodograms.jl:647-759). Segment PSDs are computed as one batched
    rFFT and mean-reduced; trailing channel dims are batched."""
    s = jnp.asarray(s)
    if s.dtype != fftintype(s.dtype):
        s = s.astype(fftintype(s.dtype))
    is_real = not jnp.iscomplexobj(s)
    if config is None:
        if onesided is None:
            onesided = is_real
        config = WelchConfig.create(
            nsamples=s.shape[0], n=n, noverlap=noverlap, onesided=onesided,
            nfft=nfft, fs=fs,
            window=window if window is not None else None)
    if config.onesided and not is_real:
        raise ValueError("cannot compute one-sided FFT of a complex signal")

    win = None if config.window is None else np.asarray(config.window)
    norm2 = float(config.nsamples) if win is None else float(np.sum(win ** 2))
    k = _num_segments(s.shape[0], config.nsamples, config.noverlap)
    if _pallas_stft_ok(s, config.nsamples, config.nfft,
                       config.nsamples - config.noverlap):
        psum = _pallas_seg_pow(s, config.nsamples, config.noverlap,
                               config.nfft, win, accumulate=True,
                               onesided=config.onesided)
        wts = _psd_weights(config.nfft, k * config.fs * norm2,
                           config.onesided)
        nbins = len(wts)
        pw = psum[:nbins] * jnp.asarray(wts, psum.dtype).reshape(
            (nbins,) + (1,) * (psum.ndim - 1))
    else:
        frames = arraysplit(s, config.nsamples, config.noverlap,
                            config.nfft, win)
        F = _fft_segments(frames, config.nfft, is_real)
        pw = _psd_from_rfft(F, config.nfft, k * config.fs * norm2,
                            config.onesided, twosided_from_rfft=is_real)
        pw = jnp.sum(pw, axis=0)
    f = (np.fft.rfftfreq(config.nfft, 1 / config.fs) if config.onesided
         else np.fft.fftfreq(config.nfft, 1 / config.fs))
    return Periodogram(pw, f)


# ---------------------------------------------------------------------------
# STFT / spectrogram
# ---------------------------------------------------------------------------

def stft(s, n=None, noverlap=None, psdonly=False, onesided=None, nfft=None,
         fs=1.0, window=None):
    """Short-time Fourier transform: (nbins, k, *chans) DFT coefficients
    (or PSD when psdonly) (reference periodograms.jl:839-897). One
    batched FFT over all segments."""
    s = jnp.asarray(s)
    if s.dtype != fftintype(s.dtype):
        s = s.astype(fftintype(s.dtype))
    is_real = not jnp.iscomplexobj(s)
    if onesided is None:
        onesided = is_real
    if onesided and not is_real:
        raise ValueError("cannot compute one-sided FFT of a complex signal")
    n = s.shape[0] >> 3 if n is None else int(n)
    noverlap = n >> 1 if noverlap is None else int(noverlap)
    nfft = nextfastfft(n) if nfft is None else int(nfft)

    win, norm2 = _resolve_window(window, n)
    if psdonly and _pallas_stft_ok(s, n, nfft, n - noverlap):
        return _pallas_spectro_pow(s, n, noverlap, nfft, win,
                                   fs * norm2, onesided)
    frames = arraysplit(s, n, noverlap, nfft, win)   # (k, nfft, *chans)
    F = _fft_segments(frames, nfft, is_real)         # (k, nbins, *chans)
    if psdonly:
        out = _psd_from_rfft(F, nfft, fs * norm2, onesided,
                             twosided_from_rfft=is_real)
    else:
        if not onesided and is_real:
            # mirror rfft coefficients to two-sided
            if nfft % 2 == 0:
                tail = jnp.conj(F[:, -2:0:-1])
            else:
                tail = jnp.conj(F[:, -1:0:-1])
            out = jnp.concatenate([F, tail], axis=1)
        else:
            out = F
    return jnp.swapaxes(out, 0, 1)                   # (nbins, k, *chans)


def spectrogram(s, n=None, noverlap=None, onesided=None, nfft=None, fs=1.0,
                window=None):
    """Spectrogram = PSD-mode STFT with time axis (reference
    periodograms.jl:828-837)."""
    s = jnp.asarray(s)
    n = s.shape[0] >> 3 if n is None else int(n)
    noverlap = n >> 1 if noverlap is None else int(noverlap)
    nfft_i = nextfastfft(n) if nfft is None else int(nfft)
    out = stft(s, n, noverlap, psdonly=True, onesided=onesided, nfft=nfft_i,
               fs=fs, window=window)
    is_real = not jnp.iscomplexobj(s)
    onesided_eff = is_real if onesided is None else onesided
    f = (np.fft.rfftfreq(nfft_i, 1 / fs) if onesided_eff
         else np.fft.fftfreq(nfft_i, 1 / fs))
    hop = n - noverlap
    k = out.shape[1]
    t = (n / 2 + hop * np.arange(k)) / fs
    return Spectrogram(out, f, t)
