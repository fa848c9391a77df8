from . import windows
from .dspbase import filt, conv, deconv, xcorr
from .periodograms import (arraysplit, periodogram, welch_pgram, spectrogram,
                           stft, WelchConfig, Periodogram, Periodogram2,
                           Spectrogram, power, freq, tfr_time, fftshift_tfr)
from .multitaper import (MTConfig, MTSpectrogramConfig,
                         MTCrossSpectraConfig, MTCoherenceConfig,
                         dpss_config, allocate_output,
                         mt_pgram, mt_spectrogram,
                         mt_cross_power_spectra, mt_coherence,
                         CrossPowerSpectra, Coherence, coherence_from_cs)
from .lpc import lpc, arburg, levinson
from .estimation import esprit, jacobsen, quinn
