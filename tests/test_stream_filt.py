"""Streaming polyphase FIR tests (reference test/filt_stream.jl and
test/resample.jl: naive-model cross-checks, MATLAB golden fixtures,
chunked-stream == one-shot consistency)."""

from fractions import Fraction
import math

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sp

from dsptpu.filters.stream_filt import (FIRFilter, taps2pfb, resample,
                                        polyphase_filt, outputlength,
                                        inputlength)
from helpers import read_reference_data

rng = np.random.default_rng(1776)


def naivefilt(h, x, ratio=Fraction(1)):
    """Zero-stuff + filter + decimate (reference test/filt_stream.jl:4-17)."""
    ratio = Fraction(ratio)
    up, down = ratio.numerator, ratio.denominator
    stuffed = np.zeros(len(x) * up, dtype=np.result_type(h, x))
    stuffed[::up] = x
    y = sp.lfilter(h, [1.0], stuffed)
    return y[::down]


def naivefilt_arb(h, x, rate, nphi=32):
    """32x interpolation + linear interp model (reference
    test/filt_stream.jl:21-46)."""
    xi = naivefilt(h, x, Fraction(nphi))
    ylen = math.ceil(len(xi) * rate)
    y = []
    xidx, alpha = 0, 0.0
    delta, stride = math.modf(nphi / rate)
    stride = int(stride)
    while xidx < len(xi) - 1:
        y.append(xi[xidx] + alpha * (xi[xidx + 1] - xi[xidx]))
        alpha += delta
        xidx += int(math.floor(alpha)) + stride
        alpha = alpha % 1.0
    return np.asarray(y)


class TestTaps2PFB:
    def test_reference_example(self):
        # reference stream_filt.jl:289-293
        pfb = taps2pfb(np.arange(1, 10), 4)
        np.testing.assert_array_equal(
            pfb, [[9, 0, 0, 0], [5, 6, 7, 8], [1, 2, 3, 4]])


class TestGoldenResample:
    """MATLAB [y,b]=resample(x,num,den) fixtures (reference
    test/resample.jl:8-25)."""

    @pytest.mark.parametrize("num,den", [(1, 2), (2, 1), (3, 2), (2, 3)])
    def test_matlab_fixture(self, num, den):
        x = read_reference_data("resample_x.txt").ravel()
        h = read_reference_data(f"resample_taps_{num}_{den}.txt").ravel()
        want = read_reference_data(f"resample_y_{num}_{den}.txt").ravel()
        got = np.asarray(resample(x, Fraction(num, den), h))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)

    @pytest.mark.parametrize("num,den", [(1, 2), (2, 1), (3, 2), (2, 3)])
    def test_default_taps(self, num, den):
        x = read_reference_data("resample_x.txt").ravel()
        want = read_reference_data(f"resample_y_{num}_{den}.txt").ravel()
        got = np.asarray(resample(x, Fraction(num, den)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


class TestKernelsVsNaive:
    @pytest.mark.parametrize("ratio", [Fraction(1), Fraction(4),
                                       Fraction(1, 3), Fraction(3, 2),
                                       Fraction(2, 3), Fraction(147, 160)])
    def test_oneshot(self, ratio):
        h = sp.firwin(36, 0.2)
        x = rng.standard_normal(1000)
        got = np.asarray(polyphase_filt(h, x, ratio))
        want = naivefilt(h, x, ratio)
        n = min(len(got), len(want))
        assert abs(len(got) - len(want)) <= 1
        np.testing.assert_allclose(got[:n], want[:n], atol=1e-10)

    @pytest.mark.parametrize("ratio", [Fraction(1), Fraction(3),
                                       Fraction(1, 4), Fraction(3, 2),
                                       Fraction(147, 160)])
    @pytest.mark.parametrize("chunks", [1, 7])
    def test_chunked_equals_oneshot(self, ratio, chunks):
        h = sp.firwin(32, 0.25)
        x = rng.standard_normal(997)
        whole = np.asarray(polyphase_filt(h, x, ratio))
        sf = FIRFilter(h, ratio)
        bounds = np.sort(rng.choice(np.arange(1, len(x)), chunks - 1,
                                    replace=False)) if chunks > 1 else []
        parts = [np.asarray(sf.filt(c)) for c in np.split(x, bounds)]
        got = np.concatenate(parts)
        np.testing.assert_allclose(got, whole, atol=1e-12)

    @pytest.mark.parametrize("ratio", [Fraction(1), Fraction(3),
                                       Fraction(1, 4), Fraction(3, 2),
                                       Fraction(147, 160)])
    def test_sample_by_sample_streaming(self, ratio):
        """Feed the first 60 inputs ONE SAMPLE AT A TIME, then the rest
        in one call — the reference's harshest streaming pattern
        (test/filt_stream.jl:100-111): exercises inputDeficit/history
        for chunks far smaller than the tap window."""
        h = sp.firwin(32, 0.25)
        x = rng.standard_normal(500)
        whole = np.asarray(polyphase_filt(h, x, ratio))
        sf = FIRFilter(h, ratio)
        parts = [np.asarray(sf.filt(x[i:i + 1])) for i in range(60)]
        parts.append(np.asarray(sf.filt(x[60:])))
        got = np.concatenate([p for p in parts if p.size])
        np.testing.assert_allclose(got, whole, atol=1e-12)

    def test_arbitrary_vs_naive(self):
        h = sp.firwin(64, 1 / 32 * 0.9)
        x = rng.standard_normal(300)
        rate = 1.35
        got = np.asarray(polyphase_filt(h, x, rate))
        want = naivefilt_arb(h, x, rate)
        n = min(len(got), len(want))
        np.testing.assert_allclose(got[:n], want[:n], atol=5e-3)

    def test_arbitrary_chunked(self):
        h = sp.firwin(64, 0.02)
        x = rng.standard_normal(500)
        rate = math.pi
        whole = np.asarray(polyphase_filt(h, x, rate))
        sf = FIRFilter(h, rate)
        parts = [np.asarray(sf.filt(c)) for c in np.split(x, [100, 137, 400])]
        got = np.concatenate(parts)
        assert len(got) == len(whole)
        np.testing.assert_allclose(got, whole, atol=1e-9)

    def test_arbitrary_chunked_bitexact_index_plan(self):
        """Round-5 regression: the arb-rate plan derives every output's
        accumulator at its STREAM-GLOBAL index (FIRArbitrary._anchor),
        so chunked == one-shot BIT-exactly — including (a) chunk splits
        landing near phase wraps (the re-based accumulator used to flip
        3 wrap outputs per 200k to the equivalent-but-different
        (x+1, phi=0) representation and drift the output count by ±1),
        and (b) chunk sizes that land exactly on a phase cycle (69979 =
        7*9997 outputs at rate 0.9997 reproduces the FRESH (deficit=1,
        acc=0.0) state mid-stream — the plan cache key must include the
        global counters or chunk 2 replays chunk 1's plan)."""
        h = np.asarray(
            __import__("dsptpu").resample_filter(0.9997)).astype(
                np.float32)
        x = rng.standard_normal(200000).astype(np.float32)
        one = np.asarray(FIRFilter(h, 0.9997).filt(x))
        for splits in ([70000, 140000], [33333, 99999, 170001]):
            f = FIRFilter(h, 0.9997)
            got = np.concatenate(
                [np.asarray(f.filt(c)) for c in np.split(x, splits)])
            assert len(got) == len(one), (splits, len(got), len(one))
            assert np.array_equal(got, one), (
                splits, np.abs(got - one).max())


class TestLengthAlgebra:
    @pytest.mark.parametrize("ratio", [Fraction(3, 2), Fraction(2, 3),
                                       Fraction(5), Fraction(1, 4)])
    def test_roundtrip(self, ratio):
        for phi0 in range(1, ratio.numerator + 1):
            for n in (1, 10, 147, 1000):
                out = outputlength(n, ratio, phi0)
                nin_dn = inputlength(out, ratio, phi0, roundup=False)
                nin_up = inputlength(out, ratio, phi0, roundup=True)
                assert outputlength(nin_up, ratio, phi0) >= out
                assert outputlength(nin_dn, ratio, phi0) <= out

    @pytest.mark.parametrize("rate", [Fraction(3, 2), Fraction(2, 3), 2.0,
                                      Fraction(7), 0.7])
    def test_filter_predicts_output(self, rate):
        h = sp.firwin(24, 0.2)
        sf = FIRFilter(h, rate)
        x = rng.standard_normal(500)
        pred = sf.output_length(len(x))
        got = len(sf.filt(x))
        assert abs(got - pred) <= (1 if isinstance(rate, float) else 0)


class TestResampleAPI:
    def test_irrational_rate_sine(self):
        # reference test/resample.jl "irrational ratio"
        ratio = math.pi
        tx = np.linspace(0, 2, 1000)
        x = np.sin(2 * np.pi * tx)
        y = np.asarray(resample(x, ratio))
        ylen = len(y)
        assert ylen == math.ceil(1000 * ratio)
        # delay-compensated output tracks the ideal sine on its grid
        ty = np.arange(ylen) * (tx[1] - tx[0]) / ratio
        want = np.sin(2 * np.pi * ty)
        np.testing.assert_allclose(y[100:-100], want[100:-100], atol=5e-3)

    def test_dims_matches_mapslices(self):
        x = rng.standard_normal((73, 5))
        for rate in (Fraction(3, 2), Fraction(1, 2), 1.2):
            got = np.asarray(resample(x, rate, dims=0))
            for c in range(5):
                want = np.asarray(resample(x[:, c], rate))
                np.testing.assert_allclose(got[:, c], want, atol=1e-12)

    def test_dims_axis1(self):
        x = rng.standard_normal((4, 100))
        got = np.asarray(resample(x, Fraction(1, 2), dims=1))
        want = np.stack([np.asarray(resample(x[i], Fraction(1, 2)))
                         for i in range(4)])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_delay_compensation(self):
        # resampled output aligns with input (no filter group delay)
        t = np.arange(2000)
        x = np.sin(2 * np.pi * 0.01 * t)
        y = np.asarray(resample(x, Fraction(3, 2)))
        t2 = np.arange(len(y)) * 2 / 3
        want = np.sin(2 * np.pi * 0.01 * t2)
        np.testing.assert_allclose(y[100:-100], want[100:-100], atol=1e-3)


class TestArbitraryDriftPath:
    """Near-unity rates take the gather-free drift-scan path
    (_pfb_dot_arb_drift); it must agree exactly with the all-phase
    path and with the naive model, for both drift directions."""

    @pytest.mark.parametrize("rate,hlen", [
        (0.9997, 64 * 32),   # hlen a multiple of nphi
        (1.0003, 64 * 32),
        (0.9997, 1187),      # ragged hlen: exercises the broken-
        (1.0003, 1000),      # telescope tap correction (pstar/tstar)
    ])
    def test_drift_path_active_and_exact(self, rate, hlen):
        from dsptpu.filters.stream_filt import (FIRFilter, _pfb_dot_arb,
                                                _arb_drift_plan)
        h = sp.firwin(hlen, 1 / 32 * 0.9)
        rng = np.random.default_rng(11)
        x = rng.standard_normal(50_000)
        sf = FIRFilter(h, rate)
        k = sf.kernel
        head, alpha, out_len = k.plan(len(x))
        assert out_len > 1024
        dp = _arb_drift_plan(head[0], head[1], alpha, out_len,
                             k.nphi, k.taps_per_phi)
        assert dp is not None, "drift path should be active"
        assert dp["has_dups"] == (rate > 1)
        got = np.asarray(sf.filt(jnp.asarray(x)))
        # all-phase reference on the same plan
        xcat = jnp.concatenate([jnp.zeros(sf.history_len), jnp.asarray(x)])
        end0 = sf.history_len + head[0] - 1
        want = np.asarray(_pfb_dot_arb(
            xcat, k.pfb_t, k.dpfb_t, jnp.asarray(end0.astype(np.int32)),
            jnp.asarray(head[1].astype(np.int32)), jnp.asarray(alpha),
            k.taps_per_phi))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_segment_path_chunked_stream(self):
        from dsptpu.filters.stream_filt import FIRFilter
        h = sp.firwin(32 * 32, 1 / 32 * 0.9)
        rng = np.random.default_rng(12)
        x = rng.standard_normal(30_000)
        rate = 1.0003
        whole = np.asarray(polyphase_filt(h, x, rate))
        sf = FIRFilter(h, rate)
        parts = [np.asarray(sf.filt(jnp.asarray(c)))
                 for c in np.split(x, [7000, 19000])]
        got = np.concatenate(parts)
        # near-unity rates drift the phase accumulator slowly across
        # integer phase boundaries; a chunk restart re-derives acc0 with
        # different float rounding, so a handful of knife-edge outputs
        # legitimately pick the adjacent (phase, alpha) pair (the dual
        # PFB is continuous there up to the lerp, ~1e-4). Everything
        # else must match to fp noise.
        close = np.isclose(got, whole, atol=1e-10, rtol=1e-7)
        assert close.mean() > 0.999
        np.testing.assert_allclose(got, whole, atol=1e-4)

    def test_wild_rate_stays_allphase(self):
        from dsptpu.filters.stream_filt import _arb_drift_plan, FIRFilter
        h = sp.firwin(32 * 32, 1 / 32 * 0.9)
        sf = FIRFilter(h, 1.35)
        head, alpha, out_len = sf.kernel.plan(50_000)
        assert _arb_drift_plan(head[0], head[1], alpha, out_len,
                               32, 32) is None

    @pytest.mark.parametrize("rate", [0.98, 1.02, 0.9999, 1.00003,
                                      0.75, 1.5])
    def test_rate_sweep_exact_vs_allphase(self, rate):
        """Across drift-path-eligible and fallback rates alike, the
        dispatched arbitrary-rate result must equal the all-phase
        reference on the same plan (guards the _arb_drift_plan gate:
        a wrong verdict would silently route a rate through the wrong
        device program)."""
        from dsptpu.filters.stream_filt import (FIRFilter, _pfb_dot_arb,
                                                _arb_drift_plan)
        h = sp.firwin(32 * 32, 1 / 32 * 0.9)
        x = np.random.default_rng(3).standard_normal(30_000)
        f = FIRFilter(h, rate)
        k = f.kernel
        head, alpha, out_len = k.plan(len(x))
        got = np.asarray(f.filt(jnp.asarray(x)))
        xcat = jnp.concatenate([jnp.zeros(f.history_len),
                                jnp.asarray(x)])
        end0 = f.history_len + head[0] - 1
        want = np.asarray(_pfb_dot_arb(
            xcat, k.pfb_t, k.dpfb_t,
            jnp.asarray(end0.astype(np.int32)),
            jnp.asarray(head[1].astype(np.int32)),
            jnp.asarray(alpha), k.taps_per_phi))
        np.testing.assert_allclose(got, want, atol=1e-11)
