"""Multitaper spectral estimation: mt_pgram, mt_spectrogram,
mt_cross_power_spectra, mt_coherence.

Capability parity with reference src/multitaper.jl (MTConfig :5-135,
mt_pgram :143-242, MTSpectrogramConfig/mt_spectrogram :248-391,
cross spectra :409-621 — ported there from MNE-python — and coherence
:656-817). TPU-first redesign: the reference runs one FFT per
(segment, taper, channel) through a preallocated FFTW plan; here the
taper dimension joins segments and channels as leading batch dims of a
single rFFT, and the taper-weighted PSD/cross-spectral reductions are
einsums (MXU-friendly for the channel x channel contraction).
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .windows import dpss, dpsseig
from .periodograms import Periodogram, Spectrogram, _num_segments
from ..utils.fftutil import nextfastfft

__all__ = ["allocate_output",
           "MTConfig", "MTSpectrogramConfig", "MTCrossSpectraConfig",
           "MTCoherenceConfig", "dpss_config", "mt_pgram", "mt_spectrogram",
           "mt_cross_power_spectra", "mt_coherence", "CrossPowerSpectra",
           "Coherence", "coherence", "coherence_from_cs"]


def coherence(c):
    """Accessor for the pairwise-coherence array of a Coherence result
    (reference multitaper.jl:742-744, the `coherence(c::Coherence)`
    companion of `power`/`freq`)."""
    return c.coherence


@dataclass(frozen=True)
class MTConfig:
    """Static multitaper configuration (reference multitaper.jl:5-135).
    Hashable; jit specializations key on it. `window` is (n, ntapers);
    `r` the per-taper inverse normalization fs*||w_k||^2/weight_k."""
    n_samples: int
    fs: float
    nfft: int
    ntapers: int
    onesided: bool
    window: Tuple  # tuple-of-tuples (n, ntapers) for hashability
    r: Tuple

    @staticmethod
    def create(n_samples, fs=1.0, nfft=None, window=None, nw=4,
               ntapers=None, taper_weights=None, onesided=True):
        if n_samples <= 0:
            raise ValueError("n_samples must be positive")
        if ntapers is None:
            ntapers = int(2 * nw) - 1
        if ntapers <= 0:
            raise ValueError("ntapers must be positive")
        if nfft is None:
            nfft = nextfastfft(n_samples)
        if nfft < n_samples:
            raise ValueError("must have nfft >= n_samples")
        if fs <= 0:
            raise ValueError("fs must be positive")
        if taper_weights is None:
            taper_weights = np.full(ntapers, 1.0 / ntapers)
        else:
            taper_weights = np.asarray(taper_weights, dtype=np.float64)
        if window is None:
            window = np.asarray(dpss(n_samples, nw, ntapers))
            r = fs / taper_weights
        else:
            window = np.asarray(window, dtype=np.float64)
            ntapers = window.shape[1]
            if len(taper_weights) != ntapers:
                taper_weights = np.full(ntapers, 1.0 / ntapers)
            r = fs * np.sum(window ** 2, axis=0) / taper_weights
        if window.shape[0] != n_samples:
            raise ValueError("window must be (n_samples, ntapers)")
        return MTConfig(int(n_samples), float(fs), int(nfft), int(ntapers),
                        bool(onesided),
                        tuple(map(tuple, window.tolist())),
                        tuple(np.asarray(r, dtype=np.float64).tolist()))

    @property
    def window_array(self):
        return np.asarray(self.window)

    @property
    def freq(self):
        if self.onesided:
            return np.fft.rfftfreq(self.nfft, 1.0 / self.fs)
        return np.fft.fftfreq(self.nfft, 1.0 / self.fs)


def dpss_config(n_samples, nw=4, ntapers=None, fs=1.0,
                keep_only_large_evals=False, weight_by_evals=False,
                **kwargs):
    """DPSS MTConfig with eigenvalue filtering/weighting options
    (reference multitaper.jl:52-77)."""
    if ntapers is None:
        ntapers = 2 * int(nw) - 1
    window = np.asarray(dpss(n_samples, nw, ntapers))
    evals = None
    if keep_only_large_evals:
        evals = np.asarray(dpsseig(window, nw))
        mask = evals > 0.9
        window = window[:, mask]
        evals = evals[mask]
        ntapers = window.shape[1]
    if weight_by_evals:
        if evals is None:
            evals = np.asarray(dpsseig(window, nw))
        taper_weights = evals / np.sum(evals)
    else:
        taper_weights = np.full(ntapers, 1.0 / ntapers)
    return MTConfig.create(n_samples, fs=fs, window=window,
                           taper_weights=taper_weights, **kwargs)


def _tapered_fft(s, config):
    """rfft/fft of the tapered signal, batched over tapers (and any
    leading batch dims of s). s: (..., n); returns (..., ntapers, nfreq)."""
    win = jnp.asarray(config.window_array)            # (n, ntapers)
    tapered = s[..., None, :] * win.T                 # (..., ntapers, n)
    if config.onesided:
        return jnp.fft.rfft(tapered, n=config.nfft, axis=-1)
    return jnp.fft.fft(tapered, n=config.nfft, axis=-1)


def _mt_power(s, config):
    """Taper-weighted PSD: (..., nfreq). One batched FFT + reduction
    (replaces the per-taper loop, multitaper.jl:237-240)."""
    F = _tapered_fft(s, config)
    rinv = jnp.asarray(1.0 / np.asarray(config.r))    # (ntapers,)
    p = (jnp.abs(F) ** 2) * rinv[..., :, None]
    out = jnp.sum(p, axis=-2)
    if config.onesided:
        nfft = config.nfft
        nfreq = out.shape[-1]
        scale = np.ones(nfreq)
        scale[1:] = 2.0
        if nfft % 2 == 0:
            scale[-1] = 1.0
        out = out * jnp.asarray(scale)
    return out


def mt_pgram(s, fs=1.0, nfft=None, nw=4, ntapers=None, window=None,
             onesided=None, config=None):
    """Multitaper periodogram (reference multitaper.jl:177-242).
    Returns a Periodogram."""
    s = jnp.asarray(s)
    if onesided is None:
        onesided = not jnp.iscomplexobj(s)
    if config is None:
        config = MTConfig.create(s.shape[0], fs=fs, nfft=nfft, window=window,
                                 nw=nw, ntapers=ntapers, onesided=onesided)
    p = _mt_power(s, config)
    return Periodogram(p, config.freq)


@dataclass(frozen=True)
class MTSpectrogramConfig:
    """Static multitaper-spectrogram plan: an MTConfig plus the
    segmentation geometry (reference multitaper.jl:248-286). The
    reference struct also carries FFTW plans and scratch buffers; under
    XLA those live in the compiled program, so the config is pure
    static metadata and hashable (jit specializations key on it)."""
    n_samples: int
    n_overlap_samples: int
    mt_config: MTConfig

    def __post_init__(self):
        if self.mt_config.n_samples <= self.n_overlap_samples:
            raise ValueError("need samples_per_window > n_overlap_samples")

    @staticmethod
    def create(n_samples, samples_per_window=None, n_overlap_samples=None,
               mt_config=None, fs=1.0, **kwargs):
        """MTSpectrogramConfig(n_samples, mt_config, n_overlap) or
        MTSpectrogramConfig(n_samples, samples_per_window, n_overlap,
        fs=..., <MTConfig kwargs>)."""
        if mt_config is None:
            if samples_per_window is None:
                raise ValueError("need samples_per_window or mt_config")
            mt_config = MTConfig.create(samples_per_window, fs=fs, **kwargs)
        if n_overlap_samples is None:
            n_overlap_samples = mt_config.n_samples >> 1
        return MTSpectrogramConfig(int(n_samples), int(n_overlap_samples),
                                   mt_config)

    @property
    def time(self):
        n = self.mt_config.n_samples
        hop = n - self.n_overlap_samples
        nseg = _num_segments(self.n_samples, n, self.n_overlap_samples)
        return (np.arange(nseg) * hop + n / 2) / self.mt_config.fs


def mt_spectrogram(s, n=None, n_overlap=None, fs=1.0, nfft=None, nw=4,
                   ntapers=None, window=None, onesided=None, config=None):
    """Multitaper spectrogram (reference multitaper.jl:305-391): one
    batched FFT over (segment, taper, channel) and a weighted
    reduction. `config` may be an MTSpectrogramConfig or an MTConfig.
    Trailing channel dims batch: returns a Spectrogram with power
    (nfreq, nsegments, *chans)."""
    s = jnp.asarray(s)
    nsamples = s.shape[0]
    if isinstance(config, MTSpectrogramConfig):
        if nsamples != config.n_samples:
            raise ValueError("signal length does not match config.n_samples")
        n_overlap = config.n_overlap_samples
        config = config.mt_config
        n = config.n_samples
    elif config is not None:
        n = config.n_samples
        if n_overlap is None:
            n_overlap = n >> 1
    else:
        if n is None:
            n = nsamples >> 3
        if n_overlap is None:
            n_overlap = n >> 1
        if onesided is None:
            onesided = not jnp.iscomplexobj(s)
        config = MTConfig.create(n, fs=fs, nfft=nfft, window=window, nw=nw,
                                 ntapers=ntapers, onesided=onesided)
    hop = n - n_overlap
    if hop <= 0:
        raise ValueError("need n > n_overlap")
    nseg = _num_segments(nsamples, n, n_overlap)
    t = (np.arange(nseg) * hop + n / 2) / config.fs
    from .periodograms import _pallas_stft_ok
    if _pallas_stft_ok(s, n, config.nfft, hop):
        return Spectrogram(_pallas_mt_spec(s, n, n_overlap, config),
                           config.freq, t)
    from .periodograms import arraysplit
    frames = arraysplit(s, n, n_overlap)              # (nseg, n, *chans)
    frames = jnp.moveaxis(frames, 1, -1)              # (nseg, *chans, n)
    p = _mt_power(frames, config)                     # (nseg, *chans, nfreq)
    p = jnp.moveaxis(p, -1, 0)                        # (nfreq, nseg, *chans)
    return Spectrogram(p, config.freq, t)


def _pallas_mt_spec(s, n, n_overlap, config):
    """Fused multitaper spectrogram: ONE pass of the windowed-segment
    kernel with all K taper planes — the signal is read once, each
    frame is windowed by every taper in VMEM, and the per-taper
    |DFT|^2 are summed in-kernel with the 1/r_k weights folded into
    the taper planes (|F_k|^2 / r_k == |F of (w_k/sqrt(r_k))*seg|^2;
    reference per-taper loop multitaper.jl:237-240). Returns
    (nfreq, nseg, *chans)."""
    from ..kernels.stft import stft_pow_pallas
    nfft, hop = config.nfft, n - n_overlap
    nseg = _num_segments(s.shape[0], n, n_overlap)
    flat = s.reshape(s.shape[0], -1)
    win = config.window_array                          # (n, ntapers)
    r = np.asarray(config.r, np.float64)
    W = np.zeros((win.shape[1], nfft))
    W[:, :n] = (win / np.sqrt(r)).T
    try:
        interp = jax.devices()[0].platform in ("cpu",)
    except Exception:
        interp = True
    # TB=256 measured best for the round-4 one-matmul stage 2 on v5e
    # (spectrogram-raw 5.65 vs 6.13 ms at TB=128 on the 64ch x 1M
    # bench config)
    TB = min(256, -(-nseg // 8) * 8)
    tile = stft_pow_pallas(flat, W, nfft, hop, nseg, accumulate=False,
                           raw=True, TB=TB, interpret=interp)
    C, nblocks, N1, TBk, _ = tile.shape
    nbins = nfft // 2 + 1 if config.onesided else nfft
    l2 = (nbins - 1) // N1 + 1
    pw = jnp.transpose(tile[..., :l2], (4, 2, 1, 3, 0))
    pw = pw.reshape(l2 * N1, nblocks * TBk, C)[:nbins, :nseg]
    if config.onesided:
        scale = np.ones(nbins)
        scale[1:] = 2.0
        if nfft % 2 == 0:
            scale[-1] = 1.0
        pw = pw * jnp.asarray(scale, pw.dtype)[:, None, None]
    return pw.reshape((nbins, nseg) + s.shape[1:])


@dataclass(frozen=True)
class CrossPowerSpectra:
    power: object  # (n_channels, n_channels, nfreq)
    freq: object


@dataclass(frozen=True)
class Coherence:
    coherence: object
    freq: object


def _freq_mask(freq, freq_range):
    if freq_range is None:
        return slice(None), freq
    lo, hi = freq_range[0], freq_range[-1]
    mask = (freq > lo) & (freq < hi)
    return np.flatnonzero(mask), freq[mask]


@dataclass(frozen=True)
class MTCrossSpectraConfig:
    """Static plan for mt_cross_power_spectra (reference
    multitaper.jl:424-516). The reference's scratch arrays (x_mt,
    demeaned_signal) are XLA temporaries here; what remains is the
    static metadata the kernel specializes on. `freq_range` is kept as
    a hashable tuple (lo, hi) or None."""
    n_channels: int
    demean: bool
    freq_range: Optional[Tuple]
    mt_config: MTConfig

    @staticmethod
    def create(n_channels, n_samples=None, mt_config=None, fs=1.0,
               demean=False, freq_range=None, **kwargs):
        if mt_config is None:
            if n_samples is None:
                raise ValueError("need n_samples or mt_config")
            mt_config = MTConfig.create(n_samples, fs=fs, **kwargs)
        if not mt_config.onesided:
            raise ValueError("mt_cross_power_spectra requires a onesided "
                             "(real-input) MTConfig")
        if freq_range is not None:
            freq_range = (float(freq_range[0]), float(freq_range[-1]))
        return MTCrossSpectraConfig(int(n_channels), bool(demean),
                                    freq_range, mt_config)

    @property
    def freq(self):
        _, freqs = _freq_mask(self.mt_config.freq, self.freq_range)
        return freqs

    @property
    def normalization_weights(self):
        return 2.0 / np.asarray(self.mt_config.r)


@dataclass(frozen=True)
class MTCoherenceConfig:
    """Static plan for mt_coherence (reference multitaper.jl:656-690):
    a cross-spectra plan plus nothing else device-side (the coherence
    normalization is derived from the cross-spectral matrix)."""
    cs_config: MTCrossSpectraConfig

    @staticmethod
    def create(n_channels, n_samples=None, mt_config=None, fs=1.0,
               demean=False, freq_range=None, **kwargs):
        cs = MTCrossSpectraConfig.create(
            n_channels, n_samples, mt_config, fs=fs, demean=demean,
            freq_range=freq_range, **kwargs)
        return MTCoherenceConfig(cs)

    @property
    def freq(self):
        return self.cs_config.freq


def mt_cross_power_spectra(signal, fs=1.0, demean=False, freq_range=None,
                           nfft=None, nw=4, ntapers=None, window=None,
                           config=None):
    """Multitapered cross power spectra between channels (reference
    multitaper.jl:544-651, after MNE-python). `signal` is
    (n_channels, n_samples), real. Returns CrossPowerSpectra with an
    (n_channels, n_channels, nfreq) array.
    """
    signal = jnp.asarray(signal)
    if jnp.iscomplexobj(signal):
        raise ValueError("only real signals supported (onesided)")
    n_channels, n_samples = signal.shape
    if isinstance(config, MTCrossSpectraConfig):
        if n_channels != config.n_channels:
            raise ValueError("channel count does not match config")
        demean = config.demean
        freq_range = config.freq_range
        config = config.mt_config
    elif config is None:
        config = MTConfig.create(n_samples, fs=fs, nfft=nfft, window=window,
                                 nw=nw, ntapers=ntapers, onesided=True)
    if demean:
        signal = signal - jnp.mean(signal, axis=1, keepdims=True)
    F = _tapered_fft(signal, config)          # (n_channels, ntapers, nfreq)
    # one-sided edge-bin correction: DC (and Nyquist for even nfft)
    # carry no conjugate partner, so the doubling below over-counts
    # them by 2; divide those bins by sqrt(2) (multitaper.jl:579-582)
    nfreq = F.shape[-1]
    corr = np.ones(nfreq)
    corr[0] = 1 / np.sqrt(2)
    if config.nfft % 2 == 0:
        corr[-1] = 1 / np.sqrt(2)
    F = F * jnp.asarray(corr)
    w = jnp.asarray(2.0 / np.asarray(config.r))      # (ntapers,)
    idx, freqs = _freq_mask(config.freq, freq_range)
    if not isinstance(idx, slice):
        F = F[:, :, jnp.asarray(idx)]
    # S^{lm}(f) = sum_k w_k J_k^l(f) conj(J_k^m(f))
    out = jnp.einsum("k,lkf,mkf->lmf", w, F, jnp.conj(F))
    return CrossPowerSpectra(out, freqs)


def coherence_from_cs(cs_matrix):
    """Pairwise coherence from a cross-spectral matrix (reference
    multitaper.jl:704-724)."""
    cs = jnp.asarray(cs_matrix)
    d = jnp.real(jnp.einsum("iif->if", cs))           # (n_channels, nfreq)
    denom = jnp.sqrt(d[:, None, :] * d[None, :, :])
    coh = jnp.abs(cs) / denom
    n = cs.shape[0]
    eye = jnp.eye(n, dtype=bool)[:, :, None]
    return jnp.where(eye, 1.0, coh)


def mt_coherence(signal, fs=1.0, demean=False, freq_range=None, nfft=None,
                 nw=4, ntapers=None, window=None, config=None):
    """Pairwise channel coherences (reference multitaper.jl:765-817).
    signal: (n_channels, n_samples); `config` may be an
    MTCoherenceConfig, MTCrossSpectraConfig, or MTConfig. Returns a
    Coherence object."""
    if isinstance(config, MTCoherenceConfig):
        config = config.cs_config
    cs = mt_cross_power_spectra(signal, fs=fs, demean=demean,
                                freq_range=freq_range, nfft=nfft, nw=nw,
                                ntapers=ntapers, window=window, config=config)
    return Coherence(coherence_from_cs(cs.power), cs.freq)


def allocate_output(config):
    """Pre-sized output array for a config (reference DSP.jl:12,
    multitaper.jl:137,332,518,693). Under XLA the runtime owns output
    buffers, so this exists for API parity: it returns a correctly
    shaped/typed zeros array (useful for shape planning and as a
    donation template)."""
    import jax.numpy as jnp
    from .periodograms import WelchConfig
    if isinstance(config, MTConfig):
        return jnp.zeros(len(config.freq))
    if isinstance(config, MTSpectrogramConfig):
        return jnp.zeros((len(config.mt_config.freq), len(config.time)))
    if isinstance(config, MTCrossSpectraConfig):
        return jnp.zeros((config.n_channels, config.n_channels,
                          len(config.freq)), jnp.complex64)
    if isinstance(config, MTCoherenceConfig):
        n = config.cs_config.n_channels
        return jnp.zeros((n, n, len(config.freq)))
    if isinstance(config, WelchConfig):
        nb = (config.nfft // 2 + 1) if config.onesided else config.nfft
        return jnp.zeros(nb)
    raise TypeError(f"no allocate_output for {type(config)}")
