from .pfb2 import pallas_available
