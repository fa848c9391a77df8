"""Streaming polyphase FIR engine: single-rate, interpolation,
decimation, rational and arbitrary-rate resampling.

Capability parity with reference src/Filters/stream_filt.jl (kernels
:8-134, FIRFilter :137-210, setphase!/reset! :216-276, taps2pfb
:294-307, length algebra :317-403, filt! :409-625, resample :663-775).

TPU-first redesign. The reference's inner loop is a data-dependent
while loop doing one tapsPerPhi-dot per output sample
(stream_filt.jl:476-515). Here the per-output index sequences
(input index, phase index, intra-phase alpha) have exact closed forms
given the entry state, so they are precomputed as index arrays by pure
host integer algebra — reproducing the reference's sample-exact stream
semantics (inputDeficit, history, phase carry) — and the device kernel
is a fully regular `gather -> batched dot` over a (outLen, tapsPerPhi)
window matrix, jit-compiled with static shapes. Channels batch on the
trailing dims and ride the VPU lanes; the Pallas kernel (kernels/) can
swap in under the same index contract.
"""

from fractions import Fraction
from functools import partial
import math

import numpy as np
import jax
import jax.numpy as jnp

from .design import resample_filter

__all__ = ["FIRFilter", "taps2pfb", "outputlength", "inputlength",
           "resample", "polyphase_filt", "timedelay"]


def timedelay(f):
    """Group delay of a streaming filter in input samples (reference
    stream_filt.jl:400-403 exports the free function form)."""
    return f.timedelay()


def taps2pfb(h, nphi):
    """Reshape taps into a (tapsPerPhi, nphi) polyphase bank, flipped
    so a column dotted with a chronological input window applies the
    convolution (reference stream_filt.jl:294-307)."""
    h = np.asarray(h)
    hlen = len(h)
    taps_per_phi = -(-hlen // nphi)
    padded = np.zeros(taps_per_phi * nphi, h.dtype)
    padded[:hlen] = h
    # row r (0-based, bottom-up time order), col c holds h[r*nphi + c]
    return padded.reshape(taps_per_phi, nphi)[::-1].copy()


# ---------------------------------------------------------------------------
# device kernels: regular gather + batched dot
# ---------------------------------------------------------------------------

def _gather_windows(xcat, end_idx, winlen):
    idx = end_idx[:, None] - (winlen - 1) + jnp.arange(winlen)[None, :]
    return xcat[idx]


def _tap_dtype(h_dtype, x_dtype):
    """Computation dtype for taps h applied to input x: keep the
    input's precision, but never silently discard complex taps
    (the reference FIRFilter is generic over tap eltype,
    stream_filt.jl:137-210)."""
    h_dtype = jnp.dtype(h_dtype)
    x_dtype = jnp.dtype(x_dtype)
    if not jnp.issubdtype(x_dtype, jnp.inexact):
        x_dtype = jnp.result_type(x_dtype, jnp.float32)
    if (jnp.issubdtype(h_dtype, jnp.complexfloating)
            and not jnp.issubdtype(x_dtype, jnp.complexfloating)):
        return jnp.result_type(h_dtype, x_dtype)
    return x_dtype


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _block_matmul(xcat, G, s0, B, M, W, out_len):
    """Block-polyphase filtering as a regular matmul (MXU path).

    Outputs are grouped into B blocks of L = G.shape[1] consecutive
    outputs; block b reads the input window xcat[s0 + b*M : +W] (frames
    built from shifted strided reshapes, no gather) and multiplies the
    (W, L) banded matrix G whose column p holds the taps of the p-th
    in-block output at its intra-block offset. Exactly reproduces the
    reference's per-output dot sequence (stream_filt.jl:476-515) at
    matmul throughput. xcat: (n, *chans)."""
    L = G.shape[1]
    xc = jnp.moveaxis(xcat, 0, -1)                     # (*chans, n)
    q = -(-(W - M) // M) if W > M else 0
    needed = s0 + (B + q + 1) * M
    pad = max(needed - xc.shape[-1], 0)
    if pad:
        xc = jnp.pad(xc, [(0, 0)] * (xc.ndim - 1) + [(0, pad)])
    dt = jnp.result_type(xc.dtype, G.dtype)
    Gd = G.astype(dt)
    parts = [xc[..., s0 + j * M: s0 + (B + j) * M]
             .reshape(xc.shape[:-1] + (B, M)) for j in range(q + 1)]
    lead = xc.shape[:-1]
    # fold channel dims into the row dim: one plain (C*B, W) @ (W, L)
    # matmul instead of a batched einsum — XLA's batched path with a
    # unit batch runs ~3x slower on v5e (measured 5.6 ms vs 1.9 ms at
    # 127 taps / 10M samples)
    if 1 <= q <= 3:
        # few wide parts (decimator/rational, M large): multiply each
        # part against its row band of G and sum — skips materializing
        # the (B, (q+1)*M) concatenated frame matrix entirely
        # (measured 0.92 ms of a 2.27 ms resample call on v5e)
        Gp = jnp.pad(Gd, ((0, (q + 1) * M - W), (0, 0)))
        y = None
        for j in range(q + 1):
            fj = parts[j].reshape((-1, M)).astype(dt)
            t = jnp.matmul(fj, Gp[j * M: (j + 1) * M],
                           precision=jax.lax.Precision.HIGHEST)
            y = t if y is None else y + t
    else:
        frames = jnp.concatenate(parts, axis=-1)[..., :W]
        fr2 = frames.reshape((-1, frames.shape[-1])).astype(dt)
        y = jnp.matmul(fr2, Gd, precision=jax.lax.Precision.HIGHEST)
    y = y.reshape(lead + (B * L,))[..., :out_len]
    return jnp.moveaxis(y, -1, 0)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _block_filt_step(history, x, G, s0, B, M, W, out_len):
    """One streaming step as ONE dispatch: history concat + block
    matmul + history-tail extraction all inside a single jit (three
    separate eager dispatches cost ~0.6 ms over a tunneled TPU)."""
    keep = history.shape[0]
    xcat = jnp.concatenate([history, x], axis=0) if keep else x
    y = _block_matmul(xcat, G, s0, B, M, W, out_len)
    hist = xcat[xcat.shape[0] - keep:] if keep else None
    return y, hist


@partial(jax.jit, static_argnums=())
def _standard_filt_step(history, x, h):
    from ..ops import dspbase
    keep = history.shape[0]
    xcat = jnp.concatenate([history, x], axis=0) if keep else x
    y = dspbase.filt(h, None, xcat)
    hist = xcat[xcat.shape[0] - keep:] if keep else None
    return y[keep:], hist


@partial(jax.jit, static_argnums=(4,))
def _pfb_dot(xcat, pfb_t, end_idx, phi_idx, winlen):
    """y[j] = dot(pfb[:, phi[j]], xcat[end[j]-winlen+1 : end[j]+1]).
    xcat: (n, *chans); pfb_t: (nphi, winlen); returns (outLen, *chans)."""
    win = _gather_windows(xcat, end_idx, winlen)         # (o, w, *chans)
    cols = pfb_t[phi_idx]                                # (o, w)
    cols = cols.reshape(cols.shape + (1,) * (win.ndim - 2))
    dt = jnp.result_type(win.dtype, cols.dtype)
    return jnp.sum(win.astype(dt) * cols.astype(dt), axis=1)


@partial(jax.jit, static_argnums=(6,))
def _pfb_dot_arb(xcat, pfb_t, dpfb_t, end_idx, phi_idx, alpha, winlen):
    """Arbitrary-rate: linear interpolation between a phase filter and
    its derivative bank (reference stream_filt.jl:579-625).

    TPU form: instead of gathering a (out_len, taps) window matrix,
    compute ALL (position, phase) filter outputs with one 2*Nphi-
    output-channel XLA convolution (lowered onto the MXU with im2col
    kept in VMEM — an explicit (nw, taps) frame stack materialized
    taps x the signal in HBM), then pick each output's (x_idx, phi)
    element with a single-element gather. The Nphi-fold FLOP overcount
    is the documented cost of full static shapes; the near-1-rate
    fast path (_arb_runs) avoids it when the phase drift is slow."""
    n = xcat.shape[0]
    nw = n - winlen + 1  # windows ending at winlen-1 .. n-1
    both = jnp.concatenate([pfb_t, dpfb_t], axis=0)   # (2*nphi, winlen)
    dt = jnp.result_type(xcat.dtype, both.dtype)
    flat_ch = xcat.reshape(n, -1)                     # (n, C)
    C = flat_ch.shape[1]
    lhs = flat_ch.T.astype(dt)[:, None, :]            # (C, 1, n)
    rhs = both.astype(dt)[:, None, :]                 # (2*nphi, 1, winlen)
    allout = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        precision=jax.lax.Precision.HIGHEST)          # (C, 2*nphi, nw)
    nphi = pfb_t.shape[0]
    # select (x position, phase) per output: flat index into (2nphi*nw)
    flat = phi_idx * nw + (end_idx - (winlen - 1))
    a2 = allout.reshape(C, 2 * nphi * nw)
    y_lo = a2[:, flat]                                # (C, o)
    y_hi = a2[:, flat + nphi * nw]
    y = y_lo + alpha[None, :].astype(y_lo.dtype) * y_hi
    out = jnp.moveaxis(y, 0, -1)                      # (o, C)
    return out.reshape((flat.shape[0],) + xcat.shape[1:])


def _arb_drift_plan(x_idx, phi_idx, alpha, out_len, nphi, winlen,
                    K=8, seg_cap=1 << 19):
    """Host planning for the gather-free drift-scan path.

    TPU gathers run at ~150 MB/s effective (measured v5e: the round-3
    segment path spent 33 of 47 ms in its two element-gathers), so this
    path uses NONE. Outputs are chopped into fixed SEG-length blocks
    such that the input-position drift d(j) = x_idx(j)-1-j moves by
    less than K inside any block; a lax.scan visits blocks in order,
    and all per-output irregularity is carried by three device arrays
    (per-position phase/alpha, per-output drift residue) consumed with
    static shifts and one-hot selects — never an index gather.

    Returns None (caller falls back to the all-phase conv path) when
    the drift is too fast for a useful SEG (rates far from 1) or the
    output is small. Reference semantics: stream_filt.jl:567-625."""
    if out_len < 4096:
        return None
    j = np.arange(out_len, dtype=np.int64)
    d = x_idx.astype(np.int64) - 1 - j          # monotone staircase
    steps = np.nonzero(np.diff(d))[0]
    # drift period from gaps BETWEEN steps (the first step can land
    # anywhere, e.g. at output 0 when the accumulator starts on a
    # phase wrap); the exact dv < K check below still guards any
    # pathological clustering
    spacing = int(np.diff(steps).min()) if len(steps) > 1 else out_len
    # size K (drift span per block) so the scan runs ~48 big blocks:
    # the per-iteration fixed costs, not FLOPs, dominated the v1
    # measurement (429 blocks ran 109 ms; the work itself models at
    # a few ms)
    K = int(np.clip(-(-out_len // (spacing * _DRIFT_ITERS)) + 2, K, 96))
    SEG = min(seg_cap, max((K - 1) * spacing, 0))
    SEG -= SEG % 2
    if SEG < 2048:
        return None                              # too drift-y: all-phase
    niter = -(-out_len // SEG)
    out_pad = niter * SEG
    o = np.arange(niter) * SEG
    # block base position: min position used inside the block, so the
    # drift residue dv is non-negative for either drift direction
    dpad = np.concatenate([d, np.full(out_pad - out_len, d[-1])])
    dblk = dpad.reshape(niter, SEG)
    dmin = dblk.min(axis=1)
    dv = (dblk - dmin[:, None]).reshape(-1)
    if dv.max() >= K:
        return None
    m0 = ((o + dmin) // _DRIFT_R) * _DRIFT_R
    # dv(u) = q(u) - (u - o_i) - m0_i  =  d(u) + o_i - m0_i
    dv = (dpad.reshape(niter, SEG) + (o - m0)[:, None]).reshape(-1)
    K = int(dv.max()) + 1                    # exact per-plan bound
    if K > 120:                              # dv must fit int8 after
        return None                          # rounding K up to R
    K = -(-K // _DRIFT_R) * _DRIFT_R
    # 0-based pos within x can dip to -K when the drift decreases
    # (rate > 1) — all position indexing below is therefore offset by
    # +K (and the device pads xcat by K zeros at the front) so no
    # dynamic_slice start ever goes negative and clamps (a clamped
    # start shifts the whole block's data)
    assert int(m0.min()) >= -K and int(dv.min()) >= 0
    # position-major phase/alpha: q = x_idx-1; first consumer wins,
    # a second consumer of the same position (rate > 1 duplicates at
    # phase wraps) goes into the B bank, flagged per output
    q = x_idx.astype(np.int64) - 1 + K
    npos = int(m0.max()) + K + SEG + 2 * K + 64
    npos = -(-npos // _DRIFT_R) * _DRIFT_R
    phiq = np.zeros(npos, np.int32)
    alphq = np.zeros(npos, np.float64)
    dup = np.zeros(out_len, bool)
    dup[1:] = q[1:] == q[:-1]
    first = ~dup
    phiq[q[first]] = phi_idx[first]
    alphq[q[first]] = alpha[first]
    has_dups = bool(dup.any())
    if has_dups:
        phiqb = phiq.copy()
        alphqb = alphq.copy()
        phiqb[q[dup]] = phi_idx[dup]
        alphqb[q[dup]] = alpha[dup]
        is_b = np.concatenate(
            [dup, np.zeros(out_pad - out_len, bool)])
    else:
        phiqb = alphqb = is_b = None
    return dict(SEG=SEG, K=K, niter=niter, out_pad=out_pad,
                m0=m0.astype(np.int32), dv=dv.astype(np.int8),
                phiq=phiq, alphq=alphq, phiqb=phiqb, alphqb=alphqb,
                is_b=(is_b if has_dups else None), has_dups=has_dups)


_DRIFT_R = 8      # positions per block-matmul row
_DRIFT_ITERS = 24  # scan-length target: K ~ drift steps per block


def _arb_drift_table(pfb, dtype, R=_DRIFT_R):
    """(S, R, R*nphi) banded tap tables for the row-R block-reshape
    form: z = sum_s xw[R*s:].reshape(NB, R) @ G[s] evaluates ALL nphi
    phase filters at R consecutive input positions per z row, with
    frames built from contiguous shifted reshapes only (the repo's
    zero-gather recipe; an explicit im2col of 39 strided 1-D slices
    measured 100x slower on v5e). Column layout: i*nphi + p for
    in-row position i. Only the LO bank is tabulated: the reference's
    derivative bank is dpfb = taps2pfb(diff(h)), so its dot equals
    lo_{phi+1} - lo_{phi} exactly and the interpolated output is
    (1-alpha)*lo_phi + alpha*lo_{phi+1} — tabulating it would double
    the z tensor, the dominant HBM traffic of this path."""
    taps, nphi = pfb.shape
    Wb = R + taps - 1
    S = -(-Wb // R)
    G = np.zeros((S, R, R * nphi), dtype)
    for i in range(R):
        for t in range(taps):
            s, r = divmod(i + t, R)
            G[s, r, i * nphi: (i + 1) * nphi] = pfb[t]
    return G


@partial(jax.jit, static_argnames=("SEG", "K", "niter", "winlen",
                                   "nphi", "out_len", "hist",
                                   "has_dups", "h0", "hL",
                                   "pstar", "tstar"))
def _pfb_dot_arb_drift(xcat_pad, Gp, m0, dvb, phiq, alphq, phiqb,
                       alphqb, isb, SEG, K, niter, winlen, nphi,
                       out_len, hist, has_dups, h0, hL,
                       pstar, tstar):
    """Gather-free near-unity arbitrary-rate resampling: scan over
    SEG-output blocks; per block a few banded block-reshape matmuls
    evaluate all phases/banks at every needed input position, then
    per-position one-hot phase+alpha selection and a K-way static-
    shift drift selection assemble the outputs. See _arb_drift_plan."""
    dt = jnp.result_type(xcat_pad.dtype, Gp.dtype)
    R = _DRIFT_R
    Sb = Gp.shape[0]
    NB = (SEG + K) // R + 2
    nwin = NB * R                                # positions per block
    prec = jax.lax.Precision.HIGHEST
    p_l = jnp.arange(nphi, dtype=jnp.int32)[None, None, :]

    def body(y, i):
        mk = m0[i] + K          # +K: xcat_pad carries K front-pad zeros
        x0 = hist + mk - (winlen - 1)
        xw = jax.lax.dynamic_slice(xcat_pad, (x0,),
                                   (nwin + Sb * R,)).astype(dt)
        # ONE matmul: accumulating Sb partial dots would materialize
        # the (NB, R*nphi) z tensor Sb times in HBM (measured: the
        # 6-partial form ran 0.95 ms/iter, ~all of it z traffic)
        Xc = jnp.concatenate(
            [jax.lax.slice(xw, (s * R,), (s * R + nwin,)).reshape(NB, R)
             for s in range(Sb)], axis=1)        # (NB, Sb*R)
        z = jnp.dot(Xc, Gp.reshape(Sb * R, -1), precision=prec)
        z3 = z.reshape(NB, R, nphi)
        # the phi = nphi-1 interpolation partner: the reference's
        # derivative bank appends dh[hlen-1] = 0, so its wrap dot is
        # phase 0 of the NEXT position minus the newest-sample term
        # h[0]*x[m+1]; lane 0 of the next in-row group / next row:
        lane0 = z3[:, :, 0]                                # (NB, R)
        nxt0 = jnp.concatenate(
            [lane0[:, 1:],
             jnp.concatenate([lane0[1:, :1],
                              jnp.zeros((1, 1), dt)], axis=0)], axis=1)
        xq1 = jax.lax.slice(xw, (winlen,),
                            (winlen + nwin,)).reshape(NB, R)
        nxt0 = nxt0 - h0 * xq1
        # broken-telescope tap: dh[hlen-1] is an appended zero, not
        # h[hlen] - h[hlen-1], so the lo-difference identity needs
        # +h[hlen-1]*win[t*] wherever phi == (hlen-1) % nphi
        xqs = jax.lax.slice(xw, (tstar,), (tstar + nwin,)).reshape(NB, R)

        # per-position one-hot selection: the interpolated output is
        # (1-alpha)*lo_phi + alpha*lo_{phi+1} (see _arb_drift_table)
        def select(pq, aq):
            ph = jax.lax.dynamic_slice(pq, (mk,), (nwin,))
            al = jax.lax.dynamic_slice(aq, (mk,), (nwin,)).astype(dt)
            ph3 = ph.reshape(NB, R, 1)
            al2 = al.reshape(NB, R)
            A = jnp.sum(z3 * (p_l == ph3).astype(dt), axis=2)
            N = jnp.sum(z3 * (p_l == ph3 + 1).astype(dt), axis=2)
            N = N + jnp.where(ph3[:, :, 0] == nphi - 1, nxt0, 0.0)
            N = N + jnp.where(ph3[:, :, 0] == pstar, hL * xqs, 0.0)
            return (A + al2 * (N - A)).reshape(nwin)
        zsel = select(phiq, alphq)
        if has_dups:
            zselb = select(phiqb, alphqb)
        # drift selection: y[u] = zsel[u + dv(u)], dv in [0, K)
        dv = jax.lax.dynamic_slice(dvb, (i * SEG,), (SEG,))
        if has_dups:
            bi = jax.lax.dynamic_slice(isb, (i * SEG,), (SEG,))
        acc = jnp.zeros((SEG,), dt)
        for v in range(K):
            zv = jax.lax.slice(zsel, (v,), (v + SEG,))
            if has_dups:
                zvb = jax.lax.slice(zselb, (v,), (v + SEG,))
                zv = jnp.where(bi, zvb, zv)
            acc = acc + jnp.where(dv == v, zv, 0)
        y = jax.lax.dynamic_update_slice(y, acc, (i * SEG,))
        return y, None

    y0 = jnp.zeros((niter * SEG,), dt)
    y, _ = jax.lax.scan(body, y0, jnp.arange(niter))
    return y[:out_len]


# ---------------------------------------------------------------------------
# kernel state objects (host ints + device coefficient arrays)
# ---------------------------------------------------------------------------

class _KernelBase:
    pass


class FIRStandard(_KernelBase):
    def __init__(self, h):
        self.h = np.asarray(h)
        self.hlen = len(self.h)
        self.history_len = self.hlen - 1
        self.pfb_t = jnp.asarray(self.h[::-1][None, :])  # (1, hlen)

    def reset(self):
        pass

    def plan(self, xlen):
        """Return (end_idx, phi_idx, out_len); indices are 1-based input
        positions (window end), to be offset by history_len."""
        j = np.arange(xlen)
        return j + 1, np.zeros(xlen, np.int64), xlen

    def commit(self, xlen, out_len):
        pass

    def output_length(self, xlen):
        return xlen

    def input_length(self, outlen, roundup=False):
        return outlen

    def timedelay(self):
        return (self.hlen - 1) / 2


class FIRInterpolator(_KernelBase):
    def __init__(self, h, interpolation):
        pfb = taps2pfb(h, interpolation)
        self.pfb_t = jnp.asarray(np.ascontiguousarray(pfb.T))
        self.taps_per_phi, self.nphi = pfb.shape
        self.interpolation = interpolation
        self.hlen = len(np.asarray(h))
        self.history_len = self.taps_per_phi - 1
        self.input_deficit = 1
        self.phi_idx = 1

    def reset(self):
        self.input_deficit = 1
        self.phi_idx = 1

    def plan(self, xlen):
        if xlen < self.input_deficit:
            return None, None, 0
        out_len = outputlength(xlen - self.input_deficit + 1,
                               Fraction(self.interpolation), self.phi_idx)
        q = self.phi_idx - 1 + np.arange(out_len)
        end_idx = self.input_deficit + q // self.nphi
        phi_idx = q % self.nphi
        return end_idx, phi_idx, out_len

    def commit(self, xlen, out_len):
        if out_len == 0:
            self.input_deficit -= xlen
            return
        q_next = self.phi_idx - 1 + out_len
        # after the last emitted output the loop leaves inputIdx at
        # deficit + q_next//nphi; all inputs consumed -> deficit resets
        self.phi_idx = q_next % self.nphi + 1
        self.input_deficit = 1

    def output_length(self, xlen):
        return outputlength(xlen - self.input_deficit + 1,
                            Fraction(self.interpolation), self.phi_idx)

    def input_length(self, outlen, roundup=False):
        return (inputlength(outlen, Fraction(self.interpolation),
                            self.phi_idx, roundup)
                + self.input_deficit - 1)

    def timedelay(self):
        return (self.hlen - 1) / (2 * self.nphi)


class FIRDecimator(_KernelBase):
    def __init__(self, h, decimation):
        self.h = np.asarray(h)
        self.hlen = len(self.h)
        self.decimation = decimation
        self.history_len = self.hlen - 1
        self.input_deficit = 1
        self.pfb_t = jnp.asarray(self.h[::-1][None, :])

    def reset(self):
        self.input_deficit = 1

    def plan(self, xlen):
        if xlen < self.input_deficit:
            return None, None, 0
        out_len = (xlen - self.input_deficit) // self.decimation + 1
        end_idx = self.input_deficit + self.decimation * np.arange(out_len)
        return end_idx, np.zeros(out_len, np.int64), out_len

    def commit(self, xlen, out_len):
        if out_len == 0:
            self.input_deficit -= xlen
            return
        last = self.input_deficit + self.decimation * (out_len - 1)
        self.input_deficit = last + self.decimation - xlen

    def output_length(self, xlen):
        return outputlength(xlen - self.input_deficit + 1,
                            Fraction(1, self.decimation), 1)

    def input_length(self, outlen, roundup=False):
        return (inputlength(outlen, Fraction(1, self.decimation), 1, roundup)
                + self.input_deficit - 1)

    def timedelay(self):
        return (self.hlen - 1) / 2


class FIRRational(_KernelBase):
    def __init__(self, h, ratio):
        ratio = Fraction(ratio)
        self.ratio = ratio
        pfb = taps2pfb(h, ratio.numerator)
        self.pfb_t = jnp.asarray(np.ascontiguousarray(pfb.T))
        self.taps_per_phi, self.nphi = pfb.shape
        self.hlen = len(np.asarray(h))
        self.history_len = self.taps_per_phi - 1
        self.phi_idx = 1
        self.input_deficit = 1

    def reset(self):
        self.phi_idx = 1
        self.input_deficit = 1

    def plan(self, xlen):
        if xlen < self.input_deficit:
            return None, None, 0
        num, den = self.ratio.numerator, self.ratio.denominator
        out_len = outputlength(xlen - self.input_deficit + 1, self.ratio,
                               self.phi_idx)
        j = np.arange(out_len)
        q = self.phi_idx - 1 + j * den
        end_idx = self.input_deficit + q // num
        phi_idx = q % num
        return end_idx, phi_idx, out_len

    def commit(self, xlen, out_len):
        if out_len == 0:
            self.input_deficit -= xlen
            return
        num, den = self.ratio.numerator, self.ratio.denominator
        q_next = self.phi_idx - 1 + out_len * den
        self.input_deficit = self.input_deficit + q_next // num - xlen
        self.phi_idx = q_next % num + 1

    def output_length(self, xlen):
        return outputlength(xlen - self.input_deficit + 1, self.ratio,
                            self.phi_idx)

    def input_length(self, outlen, roundup=False):
        return (inputlength(outlen, self.ratio, self.phi_idx, roundup)
                + self.input_deficit - 1)

    def timedelay(self):
        return (self.hlen - 1) / (2 * self.nphi)


class FIRArbitrary(_KernelBase):
    """Dual-PFB arbitrary-rate resampler: polyphase filter plus its
    derivative bank for intra-phase linear interpolation (reference
    stream_filt.jl:92-134; Harris 7.6.1)."""

    def __init__(self, h, rate, nphi=32):
        if rate <= 0:
            raise ValueError("rate must be greater than 0")
        h = np.asarray(h)
        if not np.issubdtype(h.dtype, np.inexact):
            h = h.astype(np.float64)
        dh = np.append(np.diff(h), h.dtype.type(0))
        pfb = taps2pfb(h, nphi)
        dpfb = taps2pfb(dh, nphi)
        self.pfb_t = jnp.asarray(np.ascontiguousarray(pfb.T))
        self.dpfb_t = jnp.asarray(np.ascontiguousarray(dpfb.T))
        self.rate = float(rate)
        self.nphi = nphi
        self.taps_per_phi = pfb.shape[0]
        self.hlen = len(h)
        self.history_len = self.taps_per_phi - 1
        self.delta = nphi / rate
        self.phi_accumulator = 0.0
        self.input_deficit = 1
        self._anchor()

    def _anchor(self):
        """Re-anchor the stream's closed form at the CURRENT state.
        Chunked streaming stays bit-identical to one-shot because
        every output's accumulator is evaluated with the SAME f64
        expression acc_base + J*delta at its stream-global index J —
        the round-4 form re-based the accumulator each chunk
        (mod + re-add), and the rounding difference flipped phase-wrap
        boundaries: 3 outputs per 200k at rate 0.9997 got the
        equivalent-but-different (x+1, phi=0) vs (x, phi=nphi-1,
        alpha~1) representation and chunked output counts drifted
        ±1 vs one-shot (the reference's sequential accumulation,
        stream_filt.jl:567-577, is chunk-invariant by construction)."""
        self._acc_base = float(self.phi_accumulator)
        self._deficit_base = int(self.input_deficit)
        self._j_total = 0
        self._consumed_total = 0

    def reset(self):
        self.phi_accumulator = 0.0
        self.input_deficit = 1
        self._anchor()

    def plan(self, xlen):
        if xlen < self.input_deficit:
            return None, None, 0
        # closed form of the reference's accumulator recurrence
        # (stream_filt.jl:567-577): acc_J = acc_base + J*delta at the
        # stream-global output index J (see _anchor)
        est = int(math.ceil((xlen - self.input_deficit + 1) * self.rate
                            - self.phi_accumulator / self.delta)) + 2
        est = max(est, 1)
        while True:
            j = self._j_total + np.arange(est)
            acc = self._acc_base + j * self.delta
            x_idx = (self._deficit_base - self._consumed_total
                     + np.floor(acc / self.nphi).astype(np.int64))
            valid = x_idx <= xlen
            if not valid.all():
                break
            est *= 2  # estimate undershot (rare, pathological rates)
        out_len = int(np.count_nonzero(valid))
        if out_len == 0:
            return None, None, 0
        acc = acc[:out_len]
        rem = np.mod(acc, self.nphi)
        phi_idx = np.floor(rem).astype(np.int64)
        alpha = rem - phi_idx
        return (x_idx[:out_len], phi_idx, out_len), alpha, out_len

    def commit(self, xlen, out_len):
        self._j_total += out_len
        self._consumed_total += xlen
        acc_next = self._acc_base + self._j_total * self.delta
        self.input_deficit = (self._deficit_base - self._consumed_total
                              + int(math.floor(acc_next / self.nphi)))
        self.phi_accumulator = float(np.mod(acc_next, self.nphi))

    def output_length(self, xlen):
        return int(math.ceil((xlen - self.input_deficit + 1) * self.rate
                             - self.phi_accumulator / self.delta))

    def input_length(self, outlen, roundup=False):
        d = 1 if roundup else 0
        inlen = math.floor((outlen - d + self.phi_accumulator / self.delta)
                           / self.rate) + d
        return int(inlen) + self.input_deficit - 1

    def timedelay(self):
        return (self.hlen - 1) / (2 * self.nphi)


# ---------------------------------------------------------------------------
# length algebra (reference stream_filt.jl:317-393) — pure int math
# ---------------------------------------------------------------------------

def outputlength(input_length, ratio, initial_phi):
    ratio = Fraction(ratio)
    num, den = ratio.numerator, ratio.denominator
    return -(-(input_length * num - initial_phi + 1) // den)


def inputlength(output_length, ratio, initial_phi, roundup=False):
    ratio = Fraction(ratio)
    num, den = ratio.numerator, ratio.denominator
    d = den if roundup else 1
    val = Fraction(output_length * den + initial_phi - d, num)
    if roundup:
        return int(math.ceil(val))
    return int(math.floor(val))


# ---------------------------------------------------------------------------
# FIRFilter
# ---------------------------------------------------------------------------

class FIRFilter:
    """Stateful streaming polyphase FIR filter (reference
    stream_filt.jl:137-210). Accepts a tap vector and a rate:

      FIRFilter(h)                  single-rate
      FIRFilter(h, 3)               interpolate by 3
      FIRFilter(h, Fraction(2, 3))  rational resample
      FIRFilter(h, 0.997, 32)       arbitrary rate, 32-phase dual PFB
      FIRFilter(rate)               taps from resample_filter(rate)

    Chunked `filt` calls carry history/phase/deficit state so the
    concatenated output is sample-identical to one-shot filtering.
    Inputs may have trailing channel dims (a superset of the reference,
    which is vector-only and maps slices)."""

    def __init__(self, h, rate=None, nphi=32):
        if np.ndim(h) == 0:
            # FIRFilter(rate[, nphi]): design the taps (reference
            # stream_filt.jl:202-210)
            rate = h
            h = (resample_filter(rate, nphi) if isinstance(rate, float)
                 else resample_filter(Fraction(rate)))
        h = np.asarray(h)
        if rate is None:
            rate = 1
        if isinstance(rate, float):
            # a float rate always selects the dual-PFB arbitrary kernel,
            # matching the reference's Float dispatch
            self.kernel = FIRArbitrary(h, rate, nphi)
        else:
            ratio = Fraction(rate)
            if ratio == 1:
                self.kernel = FIRStandard(h)
            elif ratio.denominator == 1:
                self.kernel = FIRInterpolator(h, ratio.numerator)
            elif ratio.numerator == 1:
                self.kernel = FIRDecimator(h, ratio.denominator)
            else:
                self.kernel = FIRRational(h, ratio)
        self.h = h
        self.history_len = self.kernel.history_len
        self.history = None  # allocated lazily to match channel dims

    # -- state management ---------------------------------------------------

    def reset(self):
        self.history = None
        self.kernel.reset()
        # a restarted stream gets its streaming-kernel budget back
        # (the <= 4 distinct-plan guard is per active stream, not per
        # filter-object lifetime)
        if hasattr(self.kernel, "_pfb2_states"):
            self.kernel._pfb2_states.clear()
        return self

    def setphase(self, phi):
        """Adjust the stream phase (reference setphase!
        stream_filt.jl:216-241)."""
        if phi < 0:
            raise ValueError("phi must be >= 0")
        k = self.kernel
        if isinstance(k, FIRStandard):
            raise TypeError("setphase undefined for single-rate filters")
        if isinstance(k, FIRDecimator):
            k.input_deficit += int(round(phi))
        elif isinstance(k, (FIRInterpolator, FIRRational)):
            throwaway, phi_idx = divmod(int(round(phi * k.nphi)), k.nphi)
            k.input_deficit += throwaway
            k.phi_idx = phi_idx + 1
        else:  # FIRArbitrary
            frac, whole = math.modf(phi)
            k.input_deficit += int(round(whole))
            k.phi_accumulator = frac * k.nphi
            k._anchor()
        return self

    def output_length(self, xlen):
        return self.kernel.output_length(xlen)

    def input_length(self, outlen, roundup=False):
        return self.kernel.input_length(outlen, roundup)

    def timedelay(self):
        return self.kernel.timedelay()

    # -- filtering ----------------------------------------------------------

    def _ensure_history(self, x):
        if self.history is None or self.history.shape[1:] != x.shape[1:] \
                or self.history.dtype != x.dtype:
            # cache the zero history (immutable device array): reset()
            # + filt() per chunk would otherwise pay an extra eager
            # device allocation/dispatch every call
            key = (x.shape[1:], x.dtype)
            zc = getattr(self, "_zero_hist", None)
            if zc is None or zc[0] != key:
                self._zero_hist = zc = (key, jnp.zeros(
                    (self.history_len,) + x.shape[1:], x.dtype))
            self.history = zc[1]

    def _pfb2_filt(self, k, x, xlen, out_len):
        """Zero-copy Pallas path (kernels/pfb2) for 1-D real-f32
        rational/integer-rate streams — fresh (the resample() hot
        path) or mid-stream (round-5: the history concatenates in-jit
        and the class-window geometry shifts by history_len, exactly
        the XLA block matmul's s0). Returns (y, new_history) or None
        to fall back to the XLA block matmul (channels, unsupported
        geometry, or phase-churning streams whose per-(phi0, deficit)
        tap tables would rebuild every chunk)."""
        if x.ndim != 1 or jnp.iscomplexobj(x) \
                or jnp.dtype(x.dtype) != jnp.dtype(jnp.float32):
            return None
        if jnp.iscomplexobj(k.pfb_t):
            return None
        fresh = (self.history_len == 0
                 or (getattr(self, "_zero_hist", None) is not None
                     and self.history is self._zero_hist[1]))
        # the kernel views its input as (R, 128) rows and needs >= 8
        # sublane-aligned rows; a shorter chunk would fail the
        # x2[:R8*8].reshape at trace time, poison the gate, and burn
        # a _pfb2_states slot on a doomed state
        if (0 if fresh else self.history_len) + xlen < 8 * 128:
            return None
        if not fresh:
            # streaming: each distinct (phi0, deficit) entry state
            # needs its own multi-MB host tap table (same property as
            # the XLA path's per-phase G cache, but bigger tables).
            # Allow a handful of distinct states (periodic chunk
            # streams repeat quickly); churners fall back for good.
            if jnp.issubdtype(self.history.dtype, jnp.complexfloating):
                return None
            seen = getattr(k, "_pfb2_states", None)
            if seen is None:
                seen = k._pfb2_states = set()
            state = (int(k.phi_idx) if hasattr(k, "phi_idx") else 1,
                     int(k.input_deficit), int(xlen))
            if state not in seen:
                if len(seen) >= 4:
                    return None
                seen.add(state)
        from ..ops import dspbase
        use_k, interp = dspbase._pallas_os_state()
        if not use_k:
            return None
        if isinstance(k, FIRRational):
            L, M = k.ratio.numerator, k.ratio.denominator
            phi0 = k.phi_idx
        elif isinstance(k, FIRInterpolator):
            L, M = k.interpolation, 1
            phi0 = k.phi_idx
        elif isinstance(k, FIRDecimator):
            L, M = 1, k.decimation
            phi0 = 1
        else:
            return None
        from ..kernels.pfb2 import (pfb2_supported, pfb2_default_on,
                                    pfb2_resample_pallas)
        # cache the host bank + gate verdict on the kernel instance:
        # np.asarray(k.pfb_t) is a device->host readback and the gate
        # runs per filt() call on the resample hot path
        deficit_eff = int(k.input_deficit) + (
            0 if fresh else int(self.history_len))
        cached = getattr(k, "_pfb2_gate", None)
        if cached is None or cached[0] != (phi0, deficit_eff):
            pfb_host = np.asarray(k.pfb_t).T      # (taps_per_phi, L)
            ok = pfb2_supported(L, M, pfb_host.shape[0], jnp.float32)
            # Default-on only where the kernel measured FASTER than
            # the XLA block matmul on v5e: resident-table plans and
            # few-group grouped plans (147//160). The verdict is
            # analytic — no multi-MB table build.
            fast = ok and pfb2_default_on(
                pfb_host.shape[0], L, M, int(phi0), deficit_eff)
            k._pfb2_gate = cached = [(phi0, deficit_eff), pfb_host, ok,
                                     fast]
        _, pfb_host, ok, fast = cached
        if not ok or (dspbase._PALLAS_OS is not True and not fast):
            return None
        if fresh:
            hl = self.history_len if (self.history_len
                                      and xlen >= self.history_len) else 0
            hist_arg = None
        else:
            hl = self.history_len
            hist_arg = self.history
        try:
            # the history tail rides in the kernel's jitted program —
            # an eager x[xlen-hl:] slice on a large device signal
            # costs ~0.5 ms of XLA relayout per call
            res = pfb2_resample_pallas(x, pfb_host, L, M, phi0,
                                       deficit_eff, out_len,
                                       interpret=interp, hist_len=hl,
                                       hist=hist_arg)
        except Exception as e:
            # eager callers degrade to the XLA block matmul if Mosaic
            # rejects a geometry at compile time (jitted callers see
            # the compile error directly). Record the failure so later
            # calls skip the ~24 ms retrace+fail penalty, and warn
            # once instead of hiding real bugs.
            cached[2] = False
            k._pfb2_gate = cached
            import warnings
            warnings.warn(
                f"pfb2 kernel rejected for L={L} M={M}: "
                f"{type(e).__name__}: {e} — falling back to the XLA "
                "block matmul for this kernel instance", RuntimeWarning)
            return None
        return res if hl else (res, None)

    def _block_args(self, xlen):
        """Host-side planning for the block-matmul device path: build
        the (W, L) banded tap matrix G for the kernel's current phase
        and the static block geometry. Returns (G, s0, B, M, W, out_len)."""
        k = self.kernel
        if isinstance(k, FIRRational):
            L, M = k.ratio.numerator, k.ratio.denominator
            pfb_t = np.asarray(k.pfb_t)
            taps = k.taps_per_phi
            phi0 = k.phi_idx
        elif isinstance(k, FIRInterpolator):
            L, M = k.interpolation, 1
            pfb_t = np.asarray(k.pfb_t)
            taps = k.taps_per_phi
            phi0 = k.phi_idx
        elif isinstance(k, FIRDecimator):
            L, M = 1, k.decimation
            pfb_t = np.asarray(k.pfb_t)
            taps = k.hlen
            phi0 = 1
        else:
            raise TypeError(type(k))
        deficit = k.input_deficit
        out_len = k.output_length(xlen)
        cache = getattr(k, "_g_cache", None)
        if cache is None:
            cache = k._g_cache = {}
        key = phi0
        if key in cache:
            G, W, L, M = cache[key]
        else:
            offs = [(phi0 - 1 + M * p) // L for p in range(L)]
            W = max(offs) + taps
            G = np.zeros((W, L), dtype=pfb_t.dtype)
            for p in range(L):
                G[offs[p]: offs[p] + taps, p] = pfb_t[(phi0 - 1 + M * p) % L]
            if M < 128:
                # super-block S base blocks so the per-block input
                # advance is >= 512 samples: M-sample frame slivers get
                # padded to 128 lanes on TPU (16x HBM blowup for a
                # decimator's M=8, OOM at 10M samples); the banded G_s
                # keeps the matmul overcount bounded (~2x for
                # decimators; small-L interpolators waste more FLOPs
                # but stay trivially cheap in absolute terms). For
                # M >= 128 super-blocking is a net loss: the wider
                # dense band costs more MXU work than the residual
                # lane padding costs in HBM (measured 147/160: 1.01 ms
                # aligned S=4 vs 0.92 ms as-is on v5e).
                S = -(-512 // M)
                Ws = (S - 1) * M + W
                Gs = np.zeros((Ws, S * L), dtype=G.dtype)
                for s in range(S):
                    Gs[s * M: s * M + W, s * L: (s + 1) * L] = G
                G, W, L, M = Gs, Ws, S * L, S * M
            cache[key] = (G, W, L, M)
        s0 = self.history_len + deficit - 1 - (taps - 1)
        B = -(-out_len // L)
        return G, s0, B, M, W, out_len

    def filt(self, x):
        x = jnp.asarray(x)
        xlen = x.shape[0]
        self._ensure_history(x)
        k = self.kernel
        newhist = None
        xcat = None
        if isinstance(k, FIRArbitrary):
            # xcat stays lazy: the arbd kernel path concats history+x
            # inside its jit (the eager concat costs an extra HBM pass
            # + dispatch per step); only the XLA fallbacks build it
            xcat_dtype = (jnp.result_type(self.history.dtype, x.dtype)
                          if self.history_len else x.dtype)

            def _xcat():
                nonlocal xcat
                if xcat is None:
                    xcat = (jnp.concatenate([self.history, x], axis=0)
                            if self.history_len else x)
                return xcat
            # cache the (host-exact) per-output index arrays on device:
            # the repeated reset+filt pattern (resample(), benches)
            # re-plans identically, and the upload (not the compute)
            # dominates over a tunneled TPU connection. The key
            # includes the stream-global anchor counters: (deficit,
            # phi_accumulator) alone is NOT a complete state under the
            # bit-exact global-index plan — a chunk size that lands
            # exactly on a phase cycle (e.g. 69979 = 7*9997 outputs at
            # rate 0.9997) reproduces (1, 0.0) mid-stream and would
            # replay chunk 1's plan
            key = (xlen, k.input_deficit, k.phi_accumulator,
                   k._j_total, k._consumed_total)
            cache = getattr(k, "_plan_cache", None)
            if cache is None or cache[0] != key:
                head, alpha, out_len = k.plan(xlen)
                drift = None
                arbd_dev = None
                if out_len:
                    x_idx, phi_idx = head[0], head[1]
                    adt = (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                           else np.float32)
                    end0 = self.history_len + x_idx - 1  # 0-based in xcat
                    dev = (jnp.asarray(end0.astype(np.int32)),
                           jnp.asarray(phi_idx.astype(np.int32)),
                           jnp.asarray(alpha, dtype=adt))
                    simple = (x.ndim == 1 and not jnp.iscomplexobj(x)
                              and not jnp.iscomplexobj(k.pfb_t))
                    if simple and jnp.dtype(jnp.result_type(
                            xcat_dtype, adt)) == jnp.dtype(jnp.float32):
                        # drift-window Pallas kernel (kernels/arbd):
                        # z stays in VMEM, no gathers, no z relayout
                        from ..ops import dspbase as _db
                        from ..kernels import arbd as _arbd
                        use_k, interp_k = _db._pallas_os_state()
                        if (use_k
                                and not getattr(k, "_arbd_disabled",
                                                False)
                                and _arbd.arbd_supported(
                                    k.nphi, k.taps_per_phi,
                                    jnp.float32)):
                            ap = _arbd.arbd_plan(
                                x_idx, phi_idx, alpha, out_len, k.nphi,
                                k.taps_per_phi,
                                self.history_len + xlen)
                            if ap is not None:
                                arbd_dev = (_arbd._ArbdDev(ap), interp_k)
                    dp = (_arb_drift_plan(x_idx, phi_idx, alpha, out_len,
                                          k.nphi, k.taps_per_phi)
                          if simple and arbd_dev is None else None)
                    if dp is not None:
                        tdt = jnp.result_type(
                            np.asarray(k.pfb_t).dtype, adt)
                        Gt = getattr(k, "_drift_table", None)
                        if Gt is None or Gt[0] != tdt:
                            Gnp = _arb_drift_table(
                                np.asarray(k.pfb_t).T, tdt)
                            k._drift_table = Gt = (tdt, jnp.asarray(Gnp))
                        hd = dp["has_dups"]
                        drift = (Gt[1],
                                 jnp.asarray(dp["m0"]),
                                 jnp.asarray(dp["dv"]),
                                 jnp.asarray(dp["phiq"]),
                                 jnp.asarray(dp["alphq"], adt),
                                 (jnp.asarray(dp["phiqb"]) if hd
                                  else None),
                                 (jnp.asarray(dp["alphqb"], adt) if hd
                                  else None),
                                 (jnp.asarray(dp["is_b"]) if hd
                                  else None),
                                 dp["SEG"], dp["K"], dp["niter"], hd)
                else:
                    dev = None
                cache = k._plan_cache = (key, dev, out_len, drift,
                                         arbd_dev)
            _, dev, out_len, drift, arbd_dev = cache
            if out_len and arbd_dev is not None:
                from ..kernels import arbd as _arbd
                adev, interp_k = arbd_dev
                tabs = getattr(k, "_arbd_tabs", None)
                if tabs is None:
                    TA, TB = _arbd._arbd_tables(
                        np.asarray(k.pfb_t).T.astype(np.float32))
                    tabs = k._arbd_tabs = (jax.device_put(TA),
                                           jax.device_put(TB))
                hist0 = (self.history if self.history_len
                         else jnp.zeros((0,), x.dtype))
                try:
                    y = _arbd.arbd_resample_pallas(
                        hist0, x, adev, tabs, k.nphi,
                        k.taps_per_phi, out_len,
                        h0=float(np.asarray(k.pfb_t)[0, -1]),
                        hL=float(self.h[k.hlen - 1]),
                        pstar=(k.hlen - 1) % k.nphi,
                        tstar=(k.taps_per_phi - 1
                               - (k.hlen - 1 - (k.hlen - 1) % k.nphi)
                               // k.nphi),
                        interpret=interp_k)
                except Exception as e:
                    # Mosaic geometry reject at compile time (e.g. a
                    # VMEM budget the host gate mispredicted): disable
                    # for this kernel instance, serve this chunk via
                    # the all-phase path, and let the next call replan
                    # onto the XLA drift path (same pfb2-dispatch
                    # degradation contract)
                    import warnings
                    warnings.warn(
                        f"arbd kernel rejected for nphi={k.nphi} "
                        f"taps={k.taps_per_phi}: {type(e).__name__}: "
                        f"{e} — falling back to the XLA arb paths for "
                        "this kernel instance", RuntimeWarning)
                    k._arbd_disabled = True
                    k._plan_cache = None
                    y = _pfb_dot_arb(_xcat(), k.pfb_t, k.dpfb_t,
                                     dev[0], dev[1], dev[2],
                                     k.taps_per_phi)
            elif out_len and drift is not None:
                (Gp, m0, dvb, phiq, alphq, phiqb, alphqb, isb,
                 SEG, K, niter, hd) = drift
                # K zeros at the front (block bases can dip to -K when
                # the drift decreases) and a tail pad so no block's
                # slices ever clamp — one copy, folded into the history
                # concat the arb path already pays
                pad = SEG + K + 2 * k.taps_per_phi + 64
                xc = _xcat()
                xp = jnp.concatenate(
                    [jnp.zeros((K,), xc.dtype), xc,
                     jnp.zeros((pad,), xc.dtype)])
                y = _pfb_dot_arb_drift(
                    xp, Gp, m0, dvb, phiq, alphq, phiqb, alphqb, isb,
                    SEG=SEG, K=K, niter=niter, winlen=k.taps_per_phi,
                    nphi=k.nphi, out_len=out_len,
                    hist=self.history_len, has_dups=hd,
                    h0=float(np.asarray(k.pfb_t)[0, -1]),
                    hL=float(self.h[k.hlen - 1]),
                    pstar=(k.hlen - 1) % k.nphi,
                    tstar=(k.taps_per_phi - 1
                           - (k.hlen - 1 - (k.hlen - 1) % k.nphi)
                           // k.nphi))
            elif out_len:
                y = _pfb_dot_arb(_xcat(), k.pfb_t, k.dpfb_t,
                                 dev[0], dev[1], dev[2], k.taps_per_phi)
            else:
                y = jnp.zeros((0,) + x.shape[1:],
                              _tap_dtype(np.asarray(self.h).dtype, x.dtype))
        elif isinstance(k, FIRStandard):
            out_len = xlen
            hdt = _tap_dtype(k.h.dtype, x.dtype)
            dkey = ("h", hdt)
            dcache = getattr(k, "_g_dev", None)
            if dcache is None or dcache[0] != dkey:
                k._g_dev = dcache = (dkey, jnp.asarray(k.h, hdt))
            if self.history_len:
                y, newhist = _standard_filt_step(self.history, x,
                                                 dcache[1])
            else:
                from ..ops import dspbase
                y = dspbase.filt(dcache[1], None, x)
        else:
            out_len = (k.output_length(xlen)
                       if xlen >= k.input_deficit else 0)
            pfb2_res = (self._pfb2_filt(k, x, xlen, out_len)
                        if out_len else None)
            if pfb2_res is not None:
                y, nh = pfb2_res
                if nh is not None:
                    newhist = nh
            elif out_len:
                G, s0, B, M, W, out_len = self._block_args(xlen)
                # cache the device copy: re-uploading the host-built G
                # every call costs a host->device transfer (~ms over a
                # tunneled TPU) that dwarfs the filtering matmul
                gdt = _tap_dtype(G.dtype, x.dtype)
                dkey = (id(G), gdt)
                dcache = getattr(k, "_g_dev", None)
                if dcache is None or dcache[0] != dkey:
                    k._g_dev = dcache = (dkey, jnp.asarray(G, gdt))
                Gd = dcache[1]
                if self.history_len:
                    y, newhist = _block_filt_step(self.history, x, Gd,
                                                  s0, B, M, W, out_len)
                else:
                    y = _block_matmul(x, Gd, s0, B, M, W, out_len)
            else:
                y = jnp.zeros((0,) + x.shape[1:],
                              _tap_dtype(np.asarray(self.h).dtype, x.dtype))
        k.commit(xlen, out_len)
        if self.history_len:
            if newhist is not None:
                self.history = newhist
            elif xcat is not None:
                self.history = xcat[xcat.shape[0] - self.history_len:]
            elif xlen >= self.history_len:
                # tail slice of x alone (the lazy-xcat fast paths never
                # materialise history+x; a full concat for a tap-length
                # tail would be an extra 10-40 MB HBM pass per chunk)
                self.history = x[xlen - self.history_len:]
            else:
                xcat = jnp.concatenate([self.history, x], axis=0)
                self.history = xcat[xcat.shape[0] - self.history_len:]
        return y

    __call__ = filt


def polyphase_filt(h, x, rate, nphi=32):
    """Stateless one-shot `filt(h, x, rate)` (reference
    stream_filt.jl:663-672)."""
    return FIRFilter(h, rate, nphi).filt(x)


# ---------------------------------------------------------------------------
# resample
# ---------------------------------------------------------------------------

def _undelay(sf):
    sf.setphase(sf.timedelay())


def resample(x, rate, h=None, nphi=32, dims=None):
    """Resample x at rational or arbitrary `rate`, compensating the
    filter delay and zero-padding so input/output align (reference
    stream_filt.jl:688-775). `dims` selects the axis for N-D input."""
    x = jnp.asarray(x)
    if dims is None:
        if x.ndim != 1:
            raise ValueError("N-D input requires dims")
        axis = 0
    else:
        axis = dims % x.ndim
        x = jnp.moveaxis(x, axis, 0)

    if isinstance(rate, float):
        sf = FIRFilter(resample_filter(rate, nphi) if h is None else h,
                       rate, nphi)
        eff_rate = rate
    else:
        ratio = Fraction(rate)
        sf = FIRFilter(resample_filter(ratio) if h is None else h, ratio)
        eff_rate = ratio

    _undelay(sf)
    out_len = int(math.ceil(x.shape[0] * eff_rate))
    in_len = sf.input_length(out_len, roundup=True)
    pad = max(in_len - x.shape[0], 0)
    xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)) if pad else x
    y = sf.filt(xp)
    if y.shape[0] < out_len:
        raise AssertionError("resample output shorter than expected")
    y = y[:out_len]
    if dims is not None:
        y = jnp.moveaxis(y, 0, axis)
    return y
