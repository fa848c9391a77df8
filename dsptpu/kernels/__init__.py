from .pfb import pfb_block_filt_pallas, pallas_available
