from . import windows
from .dspbase import filt, conv, deconv, xcorr
from .periodograms import (arraysplit, periodogram, welch_pgram, spectrogram,
                           stft, WelchConfig, Periodogram, Periodogram2,
                           Spectrogram, power, freq, tfr_time, fftshift_tfr)
