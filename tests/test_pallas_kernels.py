"""Pallas kernel tests (interpret mode on the CPU backend; the real
TPU path is exercised by bench runs)."""

from fractions import Fraction

import numpy as np
import pytest
import jax.numpy as jnp

import dsptpu
from dsptpu.filters import stream_filt
from dsptpu.kernels.pfb import pfb_block_filt_pallas, pallas_available

pytestmark = pytest.mark.skipif(not pallas_available,
                                reason="pallas unavailable")

rng = np.random.default_rng(1776)


@pytest.mark.parametrize("ratio", [Fraction(147, 160), Fraction(3, 2),
                                   Fraction(1, 4), Fraction(5)])
def test_matches_xla_block_matmul(ratio):
    h = np.asarray(dsptpu.resample_filter(ratio)).astype(np.float32)
    sf = stream_filt.FIRFilter(h, ratio)
    n = 20000
    x = rng.standard_normal(n).astype(np.float32)
    sf._ensure_history(jnp.asarray(x))
    G, s0, B, M, W, out_len = sf._block_args(n)
    Gj = jnp.asarray(G, jnp.float32)
    xcat = jnp.concatenate([jnp.zeros(sf.history_len, jnp.float32),
                            jnp.asarray(x)])
    want = np.asarray(stream_filt._block_matmul(xcat, Gj, s0, B, M, W,
                                                out_len))
    got = np.asarray(pfb_block_filt_pallas(
        xcat, Gj, s0=s0, B=B, M=M, W=W, TB=64, interpret=True))[:out_len]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_firfilter_pallas_flag(monkeypatch):
    monkeypatch.setattr(stream_filt, "USE_PALLAS", True)
    # interpret mode is needed off-TPU; patch the kernel call
    import dsptpu.kernels.pfb as pfb

    orig = pfb.pfb_block_filt_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pfb, "pfb_block_filt_pallas", interp)
    h = np.asarray(dsptpu.resample_filter(Fraction(3, 2))).astype(np.float32)
    x = rng.standard_normal(5000).astype(np.float32)
    got = np.asarray(stream_filt.FIRFilter(h, Fraction(3, 2)).filt(x))
    monkeypatch.setattr(stream_filt, "USE_PALLAS", False)
    want = np.asarray(stream_filt.FIRFilter(h, Fraction(3, 2)).filt(x))
    np.testing.assert_allclose(got, want, atol=1e-5)
