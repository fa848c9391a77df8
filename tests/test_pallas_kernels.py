"""Pallas kernel tests (interpret mode on the CPU backend; the real
TPU path is exercised by bench runs)."""

from fractions import Fraction

import numpy as np
import pytest
import jax.numpy as jnp

import dsptpu
from dsptpu.filters import stream_filt
from dsptpu.kernels.pfb2 import pallas_available
from scipy import signal as sp

pytestmark = pytest.mark.skipif(not pallas_available,
                                reason="pallas unavailable")

rng = np.random.default_rng(1776)


class TestSTFTKernel:
    def test_frames_and_accum_vs_numpy(self):
        from dsptpu.kernels.stft import stft_pow_pallas, bins_from_tile
        n, C, nfft, hop = 5000, 2, 512, 256
        x = rng.standard_normal((n, C)).astype(np.float32)
        win = np.hanning(nfft).astype(np.float32)
        k = (n - nfft) // hop + 1
        frames = np.stack([x[b*hop:b*hop+nfft] for b in range(k)])
        ref = np.abs(np.fft.fft(frames * win[None, :, None], axis=1)) ** 2
        tile = stft_pow_pallas(jnp.asarray(x), win, nfft, hop, k,
                               accumulate=False, TB=8, interpret=True)
        got = np.asarray(bins_from_tile(tile, nfft, nfft))
        np.testing.assert_allclose(got, ref.transpose(2, 0, 1),
                                   rtol=1e-4, atol=1e-3 * ref.max())
        acc = stft_pow_pallas(jnp.asarray(x), win, nfft, hop, k,
                              accumulate=True, TB=8, interpret=True)
        gacc = np.asarray(bins_from_tile(acc, nfft, nfft // 2 + 1))
        racc = ref.sum(axis=0)[: nfft // 2 + 1]
        np.testing.assert_allclose(gacc, racc.T, rtol=1e-4,
                                   atol=1e-3 * racc.max())

    def test_welch_pgram_forced_pallas(self, monkeypatch):
        import dsptpu.ops.periodograms as pmod
        from scipy import signal as sp
        monkeypatch.setattr(pmod, "_PALLAS_STFT", True)
        x = rng.standard_normal((20000, 2)).astype(np.float32)
        win = np.asarray(dsptpu.windows.hanning(1024)).astype(np.float32)
        p = dsptpu.welch_pgram(jnp.asarray(x), 1024, 512, window=win)
        _, p_ref = sp.welch(x, axis=0, nperseg=1024, noverlap=512,
                            window=win, detrend=False)
        np.testing.assert_allclose(np.asarray(p.power), p_ref,
                                   rtol=1e-4, atol=1e-5 * p_ref.max())

    def test_spectrogram_forced_pallas(self, monkeypatch):
        import dsptpu.ops.periodograms as pmod
        from scipy import signal as sp
        monkeypatch.setattr(pmod, "_PALLAS_STFT", True)
        x = rng.standard_normal(30000).astype(np.float32)
        win = np.asarray(dsptpu.windows.hanning(1024)).astype(np.float32)
        sg = dsptpu.spectrogram(jnp.asarray(x), 1024, 512, window=win)
        _, _, S = sp.spectrogram(x, nperseg=1024, noverlap=512, window=win,
                                 detrend=False, mode="psd")
        np.testing.assert_allclose(np.asarray(sg.power), S, rtol=1e-4,
                                   atol=1e-5 * S.max())

    def test_multi_window_kernel_vs_singles(self):
        """K stacked windows must equal the sum of K single-window
        calls (in-kernel multitaper accumulation)."""
        from dsptpu.kernels.stft import stft_pow_pallas
        n, nfft, hop = 6000, 512, 256
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        k = (n - nfft) // hop + 1
        wins = np.stack([np.hanning(nfft), np.hamming(nfft),
                         np.blackman(nfft)]).astype(np.float32)
        got = np.asarray(stft_pow_pallas(x, wins, nfft, hop, k,
                                         accumulate=False, TB=8,
                                         interpret=True))
        want = sum(np.asarray(stft_pow_pallas(x, w, nfft, hop, k,
                                              accumulate=False, TB=8,
                                              interpret=True))
                   for w in wins)
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   atol=1e-4 * want.max())

    def test_mt_spectrogram_forced_pallas(self, monkeypatch):
        """Fused multitaper spectrogram path vs the XLA taper loop."""
        import dsptpu.ops.periodograms as pmod
        import dsptpu.ops.multitaper as mtmod
        from dsptpu.ops.multitaper import mt_spectrogram, dpss_config
        x = rng.standard_normal((30000, 3)).astype(np.float32)
        cfg = dpss_config(1024, nw=4, fs=1000.0, nfft=1024,
                          weight_by_evals=True)
        monkeypatch.setattr(pmod, "_PALLAS_STFT", False)
        want = mt_spectrogram(jnp.asarray(x), config=cfg,
                              n_overlap=512)
        monkeypatch.setattr(pmod, "_PALLAS_STFT", True)
        calls = []
        orig = mtmod._pallas_mt_spec
        monkeypatch.setattr(mtmod, "_pallas_mt_spec",
                            lambda *a, **kw: (calls.append(1),
                                              orig(*a, **kw))[1])
        got = mt_spectrogram(jnp.asarray(x), config=cfg, n_overlap=512)
        assert calls, "pallas mt path was not taken"
        wp = np.asarray(want.power)
        np.testing.assert_allclose(np.asarray(got.power), wp,
                                   rtol=1e-4, atol=1e-5 * wp.max())
        np.testing.assert_allclose(got.freq, want.freq)
        np.testing.assert_allclose(got.time, want.time)


class TestBiirKernel:
    def test_matches_xla_blockss(self):
        from dsptpu.filters.filt import (_blockss, _single_ss,
                                         _stack_cascade, _blockss_apply)
        from dsptpu.kernels.biir import blockss_filt_pallas
        from scipy import signal as sp
        sos = sp.butter(8, 0.4, output="sos")
        sos5 = np.column_stack([sos[:, :3], sos[:, 4:]])
        ss = _blockss(*_stack_cascade(sos5, 1.0))
        for n, C, TB in [(30011, 1, 4), (4096, 3, 8)]:
            x = rng.standard_normal((n, C)).astype(np.float32)
            z0 = jnp.asarray(
                rng.standard_normal((ss.p, C)).astype(np.float32))
            y_ref, _ = _blockss_apply(ss, jnp.asarray(x), z0,
                                      need_state=False)
            y_pal = blockss_filt_pallas(ss, jnp.asarray(x), z0, TB=TB,
                                        interpret=True)
            np.testing.assert_allclose(np.asarray(y_pal),
                                       np.asarray(y_ref), rtol=1e-4,
                                       atol=1e-5)

    def test_reverse_pass_matches_flipped_forward(self):
        """Anti-causal (reverse=True) == flip -> forward -> flip, for
        both the XLA path and the Pallas kernel, including channels and
        non-multiple-of-128 lengths."""
        from dsptpu.filters.filt import (_blockss, _stack_cascade,
                                         _blockss_apply)
        from dsptpu.kernels.biir import blockss_filt_pallas
        from scipy import signal as sp
        sos = sp.butter(6, 0.25, output="sos")
        sos5 = np.column_stack([sos[:, :3], sos[:, 4:]])
        ss = _blockss(*_stack_cascade(sos5, 1.0))
        for n, C, TB in [(30011, 1, 4), (4096, 3, 8), (1000, 16, 2)]:
            x = rng.standard_normal((n, C)).astype(np.float32)
            z0 = jnp.asarray(
                rng.standard_normal((ss.p, C)).astype(np.float32))
            fwd, _ = _blockss_apply(ss, jnp.asarray(x[::-1].copy()), z0,
                                    need_state=False)
            want = np.asarray(fwd)[::-1]
            got_xla, _ = _blockss_apply(ss, jnp.asarray(x), z0,
                                        need_state=False, reverse=True)
            np.testing.assert_allclose(np.asarray(got_xla), want,
                                       rtol=1e-4, atol=1e-5)
            got_pal = blockss_filt_pallas(ss, jnp.asarray(x), z0, TB=TB,
                                          interpret=True, reverse=True)
            np.testing.assert_allclose(np.asarray(got_pal), want,
                                       rtol=1e-4, atol=1e-5)

    def test_streaming_state_through_kernel(self, monkeypatch):
        """Chunked sosfilt(si=...) == one-shot THROUGH the pallas
        kernel path (VERDICT item 5: the streaming contract must not
        be the slow path). Spy-gated so a silently-skipped kernel
        fails the test; covers V-aligned and ragged chunk lengths +
        channels."""
        import importlib
        fmod = importlib.import_module("dsptpu.filters.filt")
        calls = []
        orig = fmod._pallas_iir_ok
        monkeypatch.setattr(fmod, "_PALLAS_IIR", True)
        monkeypatch.setattr(
            fmod, "_pallas_iir_ok",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1] or True)
        from dsptpu import sosfilt
        sos_sp = sp.butter(6, 0.3, output="sos")
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        for n, C, splits in [(6000, 1, [1024, 3093]),
                             (4096, 3, [2048]),
                             (5000, 2, [1111, 2222, 4997])]:
            shape = (n,) if C == 1 else (n, C)
            x = rng.standard_normal(shape).astype(np.float32)
            whole = np.asarray(sosfilt(ours, x))
            si = np.zeros((2, len(sos_sp)) + shape[1:], np.float32)
            parts = []
            calls.clear()
            for chunk in np.split(x, splits):
                y, si = sosfilt(ours, chunk, si=si)
                parts.append(np.asarray(y))
            assert calls, "pallas streaming path was not exercised"
            np.testing.assert_allclose(np.concatenate(parts), whole,
                                       rtol=1e-4, atol=1e-4)

    def test_kernel_state_matches_xla_state(self):
        """need_state=True kernel state == the XLA partial-block state
        for ragged n (exercises the in-kernel state tap + the host
        sub-row tail advance)."""
        from dsptpu.filters.filt import (_blockss, _stack_cascade,
                                         _blockss_apply)
        from dsptpu.kernels.biir import blockss_filt_pallas
        sos = sp.butter(8, 0.4, output="sos")
        sos5 = np.column_stack([sos[:, :3], sos[:, 4:]])
        ss = _blockss(*_stack_cascade(sos5, 1.0))
        for n, C in [(2048, 1), (30011, 2), (513, 3)]:
            x = rng.standard_normal((n, C)).astype(np.float32)
            z0 = jnp.asarray(
                rng.standard_normal((ss.p, C)).astype(np.float32))
            y_ref, zf_ref = _blockss_apply(ss, jnp.asarray(x), z0,
                                           need_state=True)
            y_pal, zf_pal = blockss_filt_pallas(
                ss, jnp.asarray(x), z0, TB=4, interpret=True,
                need_state=True)
            np.testing.assert_allclose(np.asarray(y_pal),
                                       np.asarray(y_ref),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(zf_pal),
                                       np.asarray(zf_ref),
                                       rtol=1e-3, atol=1e-4)

    def test_reverse_state_non_aligned(self):
        """reverse=True need_state=True for n % V != 0: the returned
        state equals the forward state of the flipped signal (the
        round-4 NotImplementedError edge, VERDICT item 5)."""
        from dsptpu.filters.filt import (_blockss, _stack_cascade,
                                         _blockss_apply)
        from scipy import signal as sp
        sos = sp.butter(4, 0.2, output="sos")
        sos5 = np.column_stack([sos[:, :3], sos[:, 4:]])
        ss = _blockss(*_stack_cascade(sos5, 1.0))
        for n, C in [(ss.V * 3 + 17, 2), (ss.V - 3, 1), (1001, 3)]:
            x = rng.standard_normal((n, C))
            z0 = jnp.asarray(rng.standard_normal((ss.p, C)))
            fwd, zf_ref = _blockss_apply(
                ss, jnp.asarray(x[::-1].copy()), z0, need_state=True)
            want_y = np.asarray(fwd)[::-1]
            got_y, got_zf = _blockss_apply(ss, jnp.asarray(x), z0,
                                           need_state=True, reverse=True)
            np.testing.assert_allclose(np.asarray(got_y), want_y,
                                       rtol=1e-9, atol=1e-9)
            np.testing.assert_allclose(np.asarray(got_zf),
                                       np.asarray(zf_ref),
                                       rtol=1e-9, atol=1e-9)

    def test_filtfilt_forced_pallas(self, monkeypatch):
        import importlib
        ffmod = importlib.import_module("dsptpu.filters.filt")
        monkeypatch.setattr(ffmod, "_PALLAS_IIR", True)
        x = rng.standard_normal(20000).astype(np.float32)
        f = dsptpu.filters.as_sos(
            dsptpu.digitalfilter(dsptpu.Lowpass(0.3), dsptpu.Butterworth(6)))
        got = np.asarray(dsptpu.filtfilt(f, jnp.asarray(x)))
        monkeypatch.setattr(ffmod, "_PALLAS_IIR", False)
        want = np.asarray(dsptpu.filtfilt(f, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Levinson kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p,C", [(16, 300), (8, 2500), (32, 128),
                                 (2, 200)])
def test_levinson_pallas_matches_xla(p, C):
    import importlib
    from dsptpu.kernels.levinson import levinson_pallas
    lpcmod = importlib.import_module("dsptpu.ops.lpc")

    x = rng.standard_normal((400, C)).astype(np.float32)
    n = x.shape[0]
    R = np.stack([np.sum(x[: n - l] * x[l:], axis=0) / n
                  for l in range(p + 1)], axis=0).astype(np.float32)
    Rj = jnp.asarray(R)
    a_w, e_w, r_w = lpcmod.levinson(Rj.astype(jnp.float64), p)
    a_g, e_g, r_g = levinson_pallas(Rj, p, True, 256)
    np.testing.assert_allclose(np.asarray(a_g), np.asarray(a_w),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(e_g), np.asarray(e_w),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(r_g), np.asarray(r_w),
                               rtol=2e-4, atol=2e-5)


def test_levinson_pallas_via_lpc(monkeypatch):
    """lpc(method='levinson') routes through the kernel when forced."""
    import importlib
    lpcmod = importlib.import_module("dsptpu.ops.lpc")
    monkeypatch.setattr(lpcmod, "_PALLAS_LEV", True)
    x = rng.standard_normal((400, 640)).astype(np.float32)
    a, err = dsptpu.lpc(jnp.asarray(x), 16, method="levinson")
    monkeypatch.setattr(lpcmod, "_PALLAS_LEV", False)
    a2, err2 = dsptpu.lpc(jnp.asarray(x), 16, method="levinson")
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(err), np.asarray(err2),
                               rtol=2e-4)


# ---------------------------------------------------------------------------
# Fused overlap-save conv kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,nv,nfft,C", [(5000, 127, 1024, 1),
                                         (20000, 1025, 4096, 3),
                                         (8192, 3969, 8192, 2),
                                         (300, 100, 256, 1)])
def test_osconv_pallas_matches_numpy(n, nv, nfft, C):
    from dsptpu.kernels.osconv import osconv_pallas, osconv_supported
    assert osconv_supported(nfft, nv, np.float32)
    u = rng.standard_normal((n, C)).astype(np.float32)
    v = rng.standard_normal(nv).astype(np.float32)
    got = np.asarray(osconv_pallas(u[:, 0] if C == 1 else u, v, nfft,
                                   interpret=True))
    want = np.stack([np.convolve(u[:, c].astype(np.float64),
                                 v.astype(np.float64))
                     for c in range(C)], axis=-1)
    if C == 1:
        want = want[:, 0]
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 2e-6


def test_osconv_via_conv_forced(monkeypatch):
    """conv() routes through the fused OS kernel when forced on."""
    import dsptpu.ops.dspbase as dspbase
    u = rng.standard_normal(60000).astype(np.float32)
    v = rng.standard_normal(4000).astype(np.float32)
    monkeypatch.setattr(dspbase, "_PALLAS_OS", True)
    got = np.asarray(dsptpu.conv(jnp.asarray(u), jnp.asarray(v),
                                 algorithm="fft_overlapsave"))
    monkeypatch.setattr(dspbase, "_PALLAS_OS", False)
    want = np.asarray(dsptpu.conv(jnp.asarray(u), jnp.asarray(v),
                                  algorithm="fft_overlapsave"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Fused row-shift FIR kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,nb,C", [(5000, 127, 1), (20000, 255, 3),
                                    (70000, 128, 2), (3000, 2, 1),
                                    (9000, 1000, 1)])
def test_fir_pallas_matches_lfilter(n, nb, C):
    import scipy.signal as sp
    from dsptpu.kernels.fir import fir_pallas, fir_supported
    assert fir_supported(nb, np.float32)
    x = rng.standard_normal((n, C)).astype(np.float32)
    b = rng.standard_normal(nb).astype(np.float32)
    got = np.asarray(fir_pallas(x[:, 0] if C == 1 else x, b,
                                interpret=True))
    want = sp.lfilter(b.astype(np.float64), [1.0],
                      x.astype(np.float64), axis=0)
    if C == 1:
        want = want[:, 0]
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 2e-6


def test_fir_pallas_via_filt_forced(monkeypatch):
    """filt() routes through the fused FIR kernel when forced on."""
    import dsptpu.ops.dspbase as dspbase
    x = rng.standard_normal(40000).astype(np.float32)
    b = rng.standard_normal(127).astype(np.float32)
    monkeypatch.setattr(dspbase, "_PALLAS_OS", True)
    got = np.asarray(dsptpu.filt(jnp.asarray(b), jnp.asarray(x)))
    monkeypatch.setattr(dspbase, "_PALLAS_OS", False)
    want = np.asarray(dsptpu.filt(jnp.asarray(b), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestPfb2Kernel:
    """Zero-copy rational-resample kernel (kernels/pfb2): interpret-
    mode output must match the XLA block-matmul path bit-for-bit-ish
    on f32 for every kernel type and non-trivial stream state."""

    @pytest.mark.parametrize("ratio_s,n", [
        ("147/160", 3 * 20480 + 511), ("3/2", 40_000), ("1/4", 30_000),
        ("5", 12_000)])
    def test_matches_block_matmul(self, ratio_s, n):
        from fractions import Fraction
        import dsptpu.filters.stream_filt as sfm
        from dsptpu.filters import resample_filter
        ratio = Fraction(ratio_s)
        L, M = ratio.numerator, ratio.denominator
        h = np.asarray(resample_filter(ratio)).astype(np.float32)
        pfb = sfm.taps2pfb(h, L)
        from dsptpu.kernels.pfb2 import pfb2_supported, \
            pfb2_resample_pallas
        assert pfb2_supported(L, M, pfb.shape[0], np.float32)
        rng2 = np.random.default_rng(3)
        x = rng2.standard_normal(n).astype(np.float32)
        f = sfm.FIRFilter(h, ratio)
        f.setphase(f.timedelay())
        k = f.kernel
        phi0 = getattr(k, "phi_idx", 1)
        dfc = k.input_deficit
        ref = np.asarray(f.filt(jnp.asarray(x)))   # XLA path (f32 CPU)
        y = np.asarray(pfb2_resample_pallas(
            x, pfb, L, M, phi0, dfc, len(ref), S=4, interpret=True))
        np.testing.assert_allclose(y, ref, atol=3e-5)

    def test_dispatch_streaming_through_kernel(self, monkeypatch):
        # forced-pallas: BOTH the fresh first chunk and the
        # real-history later chunks take the kernel (round-5 streaming
        # support, VERDICT item 5) — spy-gated and stream-exact vs the
        # one-shot output
        from fractions import Fraction
        import dsptpu.filters.stream_filt as sfm
        import dsptpu.ops.dspbase as dspbase
        import dsptpu.kernels.pfb2 as p2
        from dsptpu.filters import resample_filter
        monkeypatch.setattr(dspbase, "_PALLAS_OS", True)
        calls = []
        orig = p2.pfb2_resample_pallas
        monkeypatch.setattr(
            p2, "pfb2_resample_pallas",
            lambda *a, **k: (calls.append(k.get("hist") is not None),
                             orig(*a, **k))[1])
        ratio = Fraction(3, 2)
        h = np.asarray(resample_filter(ratio)).astype(np.float32)
        rng2 = np.random.default_rng(4)
        x = rng2.standard_normal(30_000).astype(np.float32)
        whole = np.asarray(sfm.FIRFilter(h, ratio).filt(jnp.asarray(x)))
        f = sfm.FIRFilter(h, ratio)
        parts = [np.asarray(f.filt(jnp.asarray(c)))
                 for c in np.split(x, [11_000, 23_000])]
        np.testing.assert_allclose(np.concatenate(parts), whole,
                                   atol=3e-5)
        # calls: one-shot (fresh), chunk 1 (fresh), chunks 2-3 (history)
        assert calls == [False, False, True, True], calls

    def test_dispatch_small_chunks_fall_back_cleanly(self, monkeypatch):
        # sub-tile chunks (< 8 rows of 128) must skip the kernel
        # BEFORE tracing (round-5 review: the reshape TypeError used to
        # be misreported as a Mosaic reject and poison the gate) — no
        # RuntimeWarning, stream still exact
        import warnings
        from fractions import Fraction
        import dsptpu.filters.stream_filt as sfm
        import dsptpu.ops.dspbase as dspbase
        from dsptpu.filters import resample_filter
        monkeypatch.setattr(dspbase, "_PALLAS_OS", True)
        ratio = Fraction(3, 2)
        h = np.asarray(resample_filter(ratio)).astype(np.float32)
        rng2 = np.random.default_rng(5)
        x = rng2.standard_normal(8000).astype(np.float32)
        whole = np.asarray(sfm.FIRFilter(h, ratio).filt(jnp.asarray(x)))
        f = sfm.FIRFilter(h, ratio)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            parts = [np.asarray(f.filt(jnp.asarray(c)))
                     for c in np.split(x, [2000, 2500, 3000, 7000])]
        np.testing.assert_allclose(np.concatenate(parts), whole,
                                   atol=3e-5)


def _spy_ff_v2(monkeypatch, fmod):
    """Wrap _filtfilt_pallas_v2 with a call counter so a test that
    intends to exercise the pallas path FAILS if a gate silently
    routes it back to XLA (this happened: the x64 suite promotes f32
    inputs to f64 before the dtype gate)."""
    calls = []
    orig = fmod._filtfilt_pallas_v2
    monkeypatch.setattr(fmod, "_filtfilt_pallas_v2",
                        lambda *a, **k: (calls.append(1),
                                         orig(*a, **k))[1])
    return calls


class TestFiltfiltPallasV2:
    """filtfilt's analytic-edge pallas path (interpret mode) must
    match the XLA extension-based path on f32 for SOS and (b, a)
    forms, at aligned (tail-length 0) and unaligned lengths."""

    @pytest.mark.parametrize("n", [4096, 5000, 4097, 8192 + 37])
    def test_sos_matches_xla(self, monkeypatch, n):
        import importlib
        fmod = importlib.import_module("dsptpu.filters.filt")
        from dsptpu import (digitalfilter, Lowpass, Butterworth,
                            filters)
        f = digitalfilter(Lowpass(0.2), Butterworth(8))
        fs = filters.as_sos(f)
        rng2 = np.random.default_rng(5)
        x = jnp.asarray(rng2.standard_normal(n).astype(np.float32))
        calls = _spy_ff_v2(monkeypatch, fmod)
        monkeypatch.setattr(fmod, "_PALLAS_IIR", False)
        want = np.asarray(fmod.filtfilt(fs, x=x))
        monkeypatch.setattr(fmod, "_PALLAS_IIR", True)
        got = np.asarray(fmod.filtfilt(fs, x=x))
        assert calls, "pallas v2 path was not taken"
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize("n", [4096, 6001])
    def test_ba_matches_xla(self, monkeypatch, n):
        import importlib
        fmod = importlib.import_module("dsptpu.filters.filt")
        from scipy import signal as sp
        b, a = sp.butter(4, 0.25)
        rng2 = np.random.default_rng(6)
        x = jnp.asarray(rng2.standard_normal(n).astype(np.float32))
        calls = _spy_ff_v2(monkeypatch, fmod)
        monkeypatch.setattr(fmod, "_PALLAS_IIR", False)
        want = np.asarray(fmod.filtfilt(b, a, x))
        monkeypatch.setattr(fmod, "_PALLAS_IIR", True)
        got = np.asarray(fmod.filtfilt(b, a, x))
        assert calls, "pallas v2 path was not taken"
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_multichannel(self, monkeypatch):
        import importlib
        fmod = importlib.import_module("dsptpu.filters.filt")
        from dsptpu import digitalfilter, Lowpass, Butterworth, filters
        f = digitalfilter(Lowpass(0.3), Butterworth(6))
        fs = filters.as_sos(f)
        rng2 = np.random.default_rng(7)
        x = jnp.asarray(rng2.standard_normal((5000, 3)).astype(np.float32))
        calls = _spy_ff_v2(monkeypatch, fmod)
        monkeypatch.setattr(fmod, "_PALLAS_IIR", False)
        want = np.asarray(fmod.filtfilt(fs, x=x))
        monkeypatch.setattr(fmod, "_PALLAS_IIR", True)
        got = np.asarray(fmod.filtfilt(fs, x=x))
        assert calls, "pallas v2 path was not taken"
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_scipy_golden(self, monkeypatch):
        """End-to-end vs scipy sosfiltfilt in f64 (not just internal
        XLA-path agreement)."""
        import importlib
        from scipy import signal as sp
        fmod = importlib.import_module("dsptpu.filters.filt")
        from dsptpu import digitalfilter, Lowpass, Butterworth, filters
        f = digitalfilter(Lowpass(0.2), Butterworth(6))
        fs = filters.as_sos(f)
        rng2 = np.random.default_rng(8)
        x = rng2.standard_normal(30_000).astype(np.float32)
        calls = _spy_ff_v2(monkeypatch, fmod)
        monkeypatch.setattr(fmod, "_PALLAS_IIR", True)
        got = np.asarray(fmod.filtfilt(fs, x=jnp.asarray(x)))
        assert calls, "pallas v2 path was not taken"
        want = sp.sosfiltfilt(sp.butter(6, 0.2, output="sos"),
                              x.astype(np.float64))
        # edges differ by convention (scipy odd-ext padlen vs the
        # MATLAB/DSP.jl Gustafsson-style pad the library implements;
        # boundary semantics are covered by the MATLAB fixtures) —
        # compare the interior
        np.testing.assert_allclose(got[100:-100], want[100:-100],
                                   atol=5e-5)


@pytest.mark.parametrize("shape", [(1024, 512), (1000, 300), (513, 2048)])
def test_transpose2d_pallas(shape):
    from dsptpu.kernels.transpose import transpose2d_pallas
    x = rng.standard_normal(shape).astype(np.float32)
    y = np.asarray(transpose2d_pallas(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y, x.T)


def test_stft_kernel_tile_op_budget():
    """Guard the welch-config traced big-tile op count so a refactor
    can't silently regress it (radix-2 stage 1 + reduce-side masking
    = 79 ops; the exact-arithmetic minimum is ~73). NOTE the round-3
    device A/B showed runtime is NOT proportional to this count (the
    plateau is per-step orchestration latency — DESIGN.md round-3
    correction); the guard still catches gross op-count regressions
    which DO cost VPU work at larger N1."""
    import jax
    from dsptpu.kernels.stft import _stft_pow_jit
    n, C, nfft, hop, TB = 1_000_000, 64, 1024, 512, 512
    nfr = (n - nfft) // hop + 1
    x = jnp.zeros((n, C), jnp.float32)
    wp = jnp.ones((1, 8, 128), jnp.float32)

    found = []

    def collect(j):
        for e in j.eqns:
            if e.primitive.name == "pallas_call":
                found.append(e.params["jaxpr"])
            for v in e.params.values():
                if hasattr(v, "jaxpr"):
                    collect(v.jaxpr)
                elif hasattr(v, "eqns"):
                    collect(v)

    closed = jax.make_jaxpr(lambda x, wp: _stft_pow_jit(
        x, wp, nfft, hop, nfr, True, "highest", TB, True, True,
        True))(x, wp)
    collect(closed.jaxpr)
    assert found, "pallas_call not found in welch trace"
    cnt = {"vpu": 0, "dot": 0}

    def walk(j):
        for e in j.eqns:
            shp = (getattr(e.outvars[0].aval, "shape", None)
                   if e.outvars else None)
            big = shp is not None and int(np.prod(shp or (1,))) >= TB * 128
            if big and e.primitive.name in ("add", "sub", "mul", "neg",
                                            "select_n", "max", "min"):
                cnt["vpu"] += 1
            if e.primitive.name == "dot_general":
                cnt["dot"] += 1
            for v in e.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif hasattr(v, "eqns"):
                    walk(v)

    kj = found[0]
    walk(kj.jaxpr if hasattr(kj, "jaxpr") else kj)
    # round-4 invariant: stage 2 is THREE shared-RHS Karatsuba matmuls
    # per taper (3/4 the products of per-k1 complex matmuls) —
    # the per-k1 small matmuls were the kernel's 34%-MXU plateau (VPU
    # tile chains measured 17-21 TB/s on v5e, i.e. ~free; the round-3
    # op-count budget guarded the wrong quantity)
    assert cnt["dot"] == 3, f"stage-2 matmul count changed: {cnt}"
    assert cnt["vpu"] <= 130, f"welch kernel tile-op count blew up: {cnt}"


def test_pfb2_kernel_mosaic_lowerable_primitives():
    """Interpret mode executes primitives Mosaic cannot lower —
    round 3 shipped a pfb2 whose boundary branches emitted `scatter`
    (.at[].set), which every interpret-mode test passed and every
    real-TPU call paid as a ~24 ms retrace+fail+fallback. Guard the
    traced kernel jaxpr against the known-unlowerable primitives."""
    import jax
    from fractions import Fraction
    import dsptpu
    from dsptpu.filters.stream_filt import (FIRFilter, taps2pfb,
                                            outputlength)
    from dsptpu.kernels import pfb2 as K2

    r = Fraction(147, 160)
    h = np.asarray(dsptpu.resample_filter(r)).astype(np.float32)
    pfb = taps2pfb(h, 147)
    f = FIRFilter(h, r)
    k = f.kernel
    n = 4_000_000
    out_len = outputlength(n - k.input_deficit + 1, r, k.phi_idx)
    plan = K2.pfb2_plan(pfb, 147, 160, k.phi_idx, k.input_deficit)
    assert plan.tab.nbytes > (4 << 20), "config no longer streams"

    x = jnp.zeros(n, jnp.float32)
    closed = jax.make_jaxpr(lambda u: K2.pfb2_resample_pallas(
        u, pfb, 147, 160, k.phi_idx, k.input_deficit, out_len))(x)

    banned = {"scatter", "scatter-add", "scatter_add", "gather"}
    hits = []

    def walk(j):
        for e in j.eqns:
            if e.primitive.name in banned:
                hits.append(e.primitive.name)
            for v in e.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif hasattr(v, "eqns"):
                    walk(v)

    walk(closed.jaxpr)
    assert not hits, f"Mosaic-unlowerable primitives in pfb2: {hits}"


class TestRegroupPlanes:
    """regroup_planes_pallas feeds the STFT kernel on TPU but the CPU
    suite otherwise exercises only the XLA prep — cover the pallas
    path (interpret mode) including the in-kernel zero fill past the
    signal and the ragged boundary block."""

    @pytest.mark.parametrize("n,C,hr,nrq", [
        (100_000, 4, 4, 220),     # ragged boundary block + zero tail
        (65_536, 2, 2, 260),      # nrq not divisible by the TRq=16 cap
        (8_192, 1, 1, 70),        # single plane, odd nrq (TRq -> 2)
    ])
    def test_matches_xla_regroup(self, n, C, hr, nrq):
        from dsptpu.kernels.transpose import regroup_planes_pallas
        x = rng.standard_normal((n, C)).astype(np.float32)
        q = np.asarray(regroup_planes_pallas(jnp.asarray(x), hr, nrq,
                                             interpret=True))
        need = nrq * hr * 128
        xT = np.zeros((C, need), np.float32)
        xT[:, :n] = x.T
        ref = xT.reshape(C, nrq, hr, 128).swapaxes(1, 2)
        np.testing.assert_array_equal(q, ref)

    def test_transpose_tall(self):
        from dsptpu.kernels.transpose import transpose_tall_pallas
        x = rng.standard_normal((10_000, 8)).astype(np.float32)
        y = np.asarray(transpose_tall_pallas(jnp.asarray(x), TR=2048,
                                             pad_to=12_000,
                                             interpret=True))
        assert y.shape[1] % 2048 == 0 and y.shape[1] >= 12_000
        np.testing.assert_array_equal(y[:, :10_000], x.T)
        assert np.all(y[:, 10_000:] == 0.0)

    @pytest.mark.parametrize("C,nb,N1,TB,l2", [
        (3, 2, 8, 16, 65), (1, 1, 4, 8, 33)])
    def test_spectro_permute(self, C, nb, N1, TB, l2):
        from dsptpu.kernels.transpose import spectro_permute_pallas
        tile = rng.standard_normal((C, nb, N1, TB, 128)).astype(
            np.float32)
        got = np.asarray(spectro_permute_pallas(jnp.asarray(tile), l2,
                                                interpret=True))
        want = np.transpose(tile[..., :l2], (4, 2, 1, 3, 0)).reshape(
            l2, N1, nb * TB, C)
        np.testing.assert_array_equal(got, want)


def test_pfb2_grouped_many_groups():
    """Grouped mode with a large group count (441//640: 78 MB table,
    G=21 class groups) — the bench ratio only exercises G=3, and each
    group is its own pl.when branch with its own table offsets. NOTE
    for probe writers: python Fraction auto-reduces, so the kernel
    params must come from the REDUCED ratio (a 441-phase bank against
    Fraction(441, 480) == 147/160 produces garbage by construction —
    that is a test bug, not a kernel bug)."""
    from fractions import Fraction
    import dsptpu.filters.stream_filt as sfm
    from dsptpu.filters import resample_filter
    from dsptpu.kernels import pfb2 as K2
    ratio = Fraction(441, 640)
    h = np.asarray(resample_filter(ratio)).astype(np.float32)
    pfb = sfm.taps2pfb(h, 441)
    f = sfm.FIRFilter(h, ratio)
    k = f.kernel
    phi0, dfc = k.phi_idx, k.input_deficit
    plan = K2.pfb2_plan(pfb, 441, 640, phi0, dfc)
    assert plan.G > 3, plan.G
    rng2 = np.random.default_rng(5)
    x = rng2.standard_normal(150_000).astype(np.float32)
    ref = np.asarray(f.filt(jnp.asarray(x)))
    y = np.asarray(K2.pfb2_resample_pallas(
        x, pfb, 441, 640, phi0, dfc, len(ref), S=2, interpret=True))
    np.testing.assert_allclose(y, ref, atol=3e-5)


class TestArbdKernel:
    """Drift-window arbitrary-rate kernel (kernels/arbd): interpret-
    mode exactness vs the all-phase reference, dispatch gating, and
    the streaming state contract through the kernel path."""

    def _allphase(self, f, x):
        from dsptpu.filters.stream_filt import _pfb_dot_arb
        k = f.kernel
        head, alpha, out_len = k.plan(len(x))
        xcat = jnp.concatenate([jnp.zeros(f.history_len, jnp.float32),
                                jnp.asarray(x)])
        end0 = f.history_len + head[0] - 1
        return np.asarray(_pfb_dot_arb(
            xcat, k.pfb_t, k.dpfb_t, jnp.asarray(end0.astype(np.int32)),
            jnp.asarray(head[1].astype(np.int32)),
            jnp.asarray(alpha.astype(np.float32)), k.taps_per_phi))

    @pytest.mark.parametrize("rate", [0.9997, 0.99999, 0.999])
    def test_matches_allphase(self, rate, monkeypatch):
        from dsptpu.ops import dspbase
        from dsptpu.filters.stream_filt import FIRFilter
        h = sp.firwin(32 * 32, 1 / 32 * 0.9).astype(np.float32)
        x = np.random.default_rng(7).standard_normal(40_000).astype(
            np.float32)
        monkeypatch.setattr(dspbase, "_PALLAS_OS", True)
        f = FIRFilter(h, rate)
        got = np.asarray(f.filt(jnp.asarray(x)))
        # the spy: the kernel plan must actually have been taken (a
        # silently skipped pallas path made earlier filtfilt tests
        # vacuous — round-3 lesson)
        assert f.kernel._plan_cache[4] is not None
        f2 = FIRFilter(h, rate)
        want = self._allphase(f2, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-6)

    @pytest.mark.parametrize("rate", [1.0003, 1.25, 0.93])
    def test_fallback_rates_still_exact(self, rate, monkeypatch):
        """Dup-producing (rate > 1) and fast-drift rates must fall back
        (arbd_dev is None) and still match the all-phase reference."""
        from dsptpu.ops import dspbase
        from dsptpu.filters.stream_filt import FIRFilter
        h = sp.firwin(32 * 32, 1 / 32 * 0.9).astype(np.float32)
        x = np.random.default_rng(8).standard_normal(40_000).astype(
            np.float32)
        monkeypatch.setattr(dspbase, "_PALLAS_OS", True)
        f = FIRFilter(h, rate)
        got = np.asarray(f.filt(jnp.asarray(x)))
        assert f.kernel._plan_cache[4] is None
        f2 = FIRFilter(h, rate)
        want = self._allphase(f2, x)
        np.testing.assert_allclose(got, want, atol=5e-6)

    def test_chunked_kernel_equals_chunked_allphase(self, monkeypatch):
        """Chunk-for-chunk the kernel output equals the all-phase path
        on the same committed stream state (the chunk-boundary phase
        residual is a property of the float accumulator, not of the
        device program — both paths must agree exactly)."""
        from dsptpu.ops import dspbase
        import dsptpu.filters.stream_filt as sfm
        h = sp.firwin(32 * 32, 1 / 32 * 0.9).astype(np.float32)
        x = np.random.default_rng(9).standard_normal(120_000).astype(
            np.float32)
        chunks = np.split(x, [40000, 80000])
        monkeypatch.setattr(dspbase, "_PALLAS_OS", False)
        monkeypatch.setattr(sfm, "_arb_drift_plan",
                            lambda *a, **k: None)
        fa = sfm.FIRFilter(h, 0.9997)
        ya = np.concatenate([np.asarray(fa.filt(jnp.asarray(c)))
                             for c in chunks])
        monkeypatch.undo()
        monkeypatch.setattr(dspbase, "_PALLAS_OS", True)
        fk = sfm.FIRFilter(h, 0.9997)
        used = []
        parts = []
        for c in chunks:
            parts.append(np.asarray(fk.filt(jnp.asarray(c))))
            used.append(fk.kernel._plan_cache[4] is not None)
        yk = np.concatenate(parts)
        assert all(used)
        np.testing.assert_allclose(yk, ya, atol=5e-6)

    def test_plan_gates(self):
        from dsptpu.kernels.arbd import arbd_plan, SEG
        from dsptpu.filters.stream_filt import FIRFilter
        h = sp.firwin(32 * 32, 1 / 32 * 0.9).astype(np.float32)
        f = FIRFilter(h, 0.9997)
        head, alpha, out_len = f.kernel.plan(30_000)
        # small output: below one SEG block
        assert out_len < SEG * 2
        p = arbd_plan(head[0], head[1], alpha, min(out_len, SEG - 1),
                      32, 32, 30_000 + 31)
        assert p is None
