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

from . import ops, utils, filters
from .ops import windows
from .ops.dspbase import conv, conv_with_offset, deconv, xcorr
from .filters import (filt, sosfilt, DF2TFilter, filtfilt, fftfilt, tdfilt,
                      ZeroPoleGain, PolynomialRatio, Biquad,
                      SecondOrderSections, coefb, coefa,
                      FilterCoefficients, FilterType,
                      Butterworth, Chebyshev1, Chebyshev2, Elliptic,
                      Lowpass, Highpass, Bandpass, Bandstop, ComplexBandpass,
                      analogfilter, digitalfilter, bilinear, iirnotch,
                      kaiserord, FIRWindow, resample_filter,
                      FIRFilter, resample, outputlength, inputlength,
                      freqresp, phaseresp, grpdelay, impresp, stepresp,
                      buttord, ellipord, cheb1ord, cheb2ord, remezord,
                      remez, RemezFilterType, filter_type_bandpass,
                      filter_type_differentiator, filter_type_hilbert,
                      timedelay)
from .ops.periodograms import (arraysplit, periodogram, welch_pgram,
                               spectrogram, stft, WelchConfig, Periodogram,
                               Periodogram2, Spectrogram, power, freq,
                               tfr_time, fftshift_tfr)
time = tfr_time      # reference accessor name (Base.time(::Spectrogram))
from .ops.multitaper import (MTConfig, MTSpectrogramConfig,
                             MTCrossSpectraConfig, MTCoherenceConfig,
                             dpss_config, allocate_output,
                             mt_pgram, mt_spectrogram,
                             mt_cross_power_spectra, mt_coherence,
                             coherence, coherence_from_cs)
from .ops.lpc import lpc, arburg, levinson, LPCBurg, LPCLevinson
from .ops.windows import rect
from .ops.estimation import esprit, jacobsen, quinn
from . import parallel
from .utils.util import (hilbert, db2pow, db2amp, pow2db, amp2db, dB, dBa,
                         rms, rmsfft,
                         meanfreq, finddelay, shiftsignal, alignsignals,
                         shiftin, unsafe_dot)
from .utils.fftutil import (nextfastfft, nextpow2, fftintype, fftouttype,
                            fftabs2type)
from .utils.unwrap import unwrap
from .utils.diric import diric
