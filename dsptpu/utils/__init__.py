from .fftutil import nextfastfft, nextpow2, nextprod
from .special import besseli0, ellipk
from . import profiling
