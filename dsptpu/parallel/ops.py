"""Sharded DSP ops: time-block sequence parallelism with halo exchange
and channel data parallelism over a jax Mesh.

TPU-native redesign of the reference's single-process block
decompositions (SURVEY.md §2.10):
  * shard_fir / shard_fftfilt — causal FIR with the nb-1-sample halo
    pulled from the left time-neighbor via ppermute (the distributed
    form of the overlap-save save-block structure, dspbase.jl:490-609).
  * shard_welch — per-shard segment PSD accumulation + psum over the
    time axis (distributed form of the Welch segment loop,
    periodograms.jl:746-759).
  * shard_sosfilt — biquad cascade where each time shard runs the
    parallel associative scan locally and the 2x2 affine boundary
    state is chained across shards (sequential over the time axis but
    O(log n_local) within each shard).

All functions take data already laid out (time, *channels) and shard
axis 0 over the mesh 'time' axis and (if present in the mesh) trailing
dims over 'channel' via the in/out specs.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

__all__ = ["shard_fir", "shard_fftfilt", "shard_welch", "shard_sosfilt",
           "shard_filtfilt",
           "shard_stft_pow", "shard_spectrogram", "shard_mt_spectrogram",
           "shard_mt_cross_power_spectra", "shard_mt_coherence",
           "shard_resample", "compact_shards"]


def _ntime(mesh, time_axis):
    return int(np.prod([d for ax, d in zip(mesh.axis_names,
                                           mesh.devices.shape)
                        if ax == time_axis]))


def _pad_time(x, total):
    """Zero-pad axis 0 to `total` rows (host-static total)."""
    if x.shape[0] == total:
        return x
    return jnp.pad(x, [(0, total - x.shape[0])]
                   + [(0, 0)] * (x.ndim - 1))


def _right_shift_halo(x_tail, axis_name):
    """Send each shard's tail to its right neighbor; shard 0 receives
    zeros (causal start)."""
    n = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    halo = lax.ppermute(x_tail, axis_name, perm)
    idx = lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(halo), halo)


def _fir_local(b, xcat):
    """Causal FIR on the halo-extended local block; valid part only."""
    from ..ops.dspbase import _fir_causal, _conv_os_1d, _FIR_OS_CUTOFF
    nb = b.shape[0]
    flat = xcat.reshape(xcat.shape[0], -1)
    if nb > _FIR_OS_CUTOFF:
        y = _conv_os_1d(flat, b, out_len=flat.shape[0])[: flat.shape[0]]
    else:
        y = _fir_causal(b, flat)
    return y[nb - 1:].reshape((xcat.shape[0] - nb + 1,) + xcat.shape[1:])


def shard_fir(b, x, mesh, time_axis="time", channel_axis=None):
    """Causal FIR filt along axis 0, time-sharded with halo exchange.
    Arbitrary lengths: the signal is zero-padded to split evenly over
    the 'time' mesh axis and the padded tail is sliced off (causal
    filter, so padding never affects earlier outputs)."""
    b = jnp.asarray(b)
    x = jnp.asarray(x)
    nb = b.shape[0]
    n_orig = x.shape[0]
    ntime = _ntime(mesh, time_axis)
    nlocal = -(-n_orig // ntime)
    if nb - 1 > nlocal:
        raise ValueError(f"filter history ({nb - 1}) exceeds the "
                         f"per-shard length ({nlocal})")
    x = _pad_time(x, nlocal * ntime)
    spec = (P(time_axis) if x.ndim == 1 or channel_axis is None
            else P(time_axis, channel_axis))

    @partial(shard_map, mesh=mesh, in_specs=(P(), spec), out_specs=spec)
    def run(b, xs):
        halo = _right_shift_halo(xs[-(nb - 1):], time_axis)
        return _fir_local(b, jnp.concatenate([halo, xs], axis=0))

    y = run(b, x)
    return y if y.shape[0] == n_orig else y[:n_orig]


# shard_fftfilt shares the halo-exchange structure; the local compute
# is the batched overlap-save path, which _fir_local already selects
# for long taps.
def shard_fftfilt(b, x, mesh, time_axis="time", channel_axis=None):
    return shard_fir(b, x, mesh, time_axis, channel_axis)


def shard_welch(x, n, noverlap, window, mesh, time_axis="time",
                channel_axis=None, fs=1.0):
    """Distributed one-sided Welch PSD over axis 0 of real x.

    Each time shard computes the PSDs of the segments that *start*
    inside it (pulling n-hop cross-boundary samples from its right
    neighbor), then psums the per-shard sums. Arbitrary lengths: the
    signal is zero-padded so the per-shard length is a hop multiple;
    segments reaching past the true signal end are masked out of the
    sum (valid-count normalization unchanged). Returns (psd, freqs)
    with psd replicated across the mesh.
    """
    x = jnp.asarray(x)
    win = jnp.asarray(window)
    hop = n - noverlap
    ntime = _ntime(mesh, time_axis)
    n_orig = x.shape[0]
    nlocal = -(-n_orig // (ntime * hop)) * hop
    x = _pad_time(x, nlocal * ntime)
    if noverlap > nlocal:
        raise ValueError("noverlap (the cross-shard halo) must not exceed "
                         "the local shard length")
    winnorm = 1.0 / (jnp.sum(win ** 2) * fs)
    nfreq = n // 2 + 1
    cspec = () if (x.ndim == 1 or channel_axis is None) else (channel_axis,)
    in_spec = P(time_axis, *cspec)
    out_spec = P(None, *cspec)

    @partial(shard_map, mesh=mesh, in_specs=(in_spec,), out_specs=(out_spec,
                                                                   P()))
    def run(xs):
        # halo: n - hop trailing samples from the right neighbor
        halo_len = n - hop
        nsh = lax.axis_size(time_axis)
        if halo_len:
            perm = [(i, (i - 1) % nsh) for i in range(nsh)]
            halo = lax.ppermute(xs[:halo_len], time_axis, perm)
            idx = lax.axis_index(time_axis)
            halo = jnp.where(idx == nsh - 1, jnp.zeros_like(halo), halo)
            xcat = jnp.concatenate([xs, halo], axis=0)
        else:
            xcat = xs
        # segments starting in this shard at 0, hop, ...; SPMD needs a
        # static per-shard count, so trailing segments that would run
        # past the global signal end are masked out instead of dropped
        nseg = nlocal // hop
        starts = jnp.arange(nseg) * hop
        shard_idx = lax.axis_index(time_axis)
        gstart = shard_idx * nlocal + starts
        valid = (gstart + n <= n_orig).astype(xcat.dtype)
        # strided-reshape framing (no gather)
        q = -(-n // hop)
        need = (nseg + q) * hop
        xp = xcat if xcat.shape[0] >= need else jnp.pad(
            xcat, [(0, need - xcat.shape[0])] + [(0, 0)] * (xcat.ndim - 1))
        parts = [xp[j * hop: (nseg + j) * hop]
                 .reshape((nseg, hop) + xcat.shape[1:]) for j in range(q)]
        frames = jnp.concatenate(parts, axis=1)[:, :n]  # (nseg, n, *chans)
        wshape = (1, n) + (1,) * (xcat.ndim - 1)
        F = jnp.fft.rfft(frames * win.reshape(wshape), axis=1)
        p = jnp.abs(F) ** 2
        p = p * valid.reshape((nseg,) + (1,) * (p.ndim - 1))
        # one-sided doubling, except DC and (even n) Nyquist bins
        scale = jnp.ones(nfreq, xcat.dtype).at[1:].set(2.0)
        if n % 2 == 0:
            scale = scale.at[-1].set(1.0)
        p = p * scale.reshape(wshape[:1] + (nfreq,) + wshape[2:])
        psum_local = jnp.sum(p, axis=0) * winnorm
        total = lax.psum(psum_local, time_axis)
        count = lax.psum(jnp.sum(valid), time_axis)
        return total / count, count

    psd, _ = run(x)
    freqs = jnp.fft.rfftfreq(n, d=1.0 / fs)
    return psd, freqs


def _shard_affine_prefix(T_np, v, axis_name, nsh):
    """Exclusive affine prefix over a mesh axis: shard k receives
    zin_k = sum_{j<k} T^{k-1-j} v_j (zin_0 = 0), in ceil(log2 nsh)
    ppermute-doubling steps. Each step moves one (p, C) state and the
    running (p, p) transition — O(log) depth, O(p^2 + pC) bytes per
    step, replacing an O(nsh^2) all_gather chain. v: (p, C)."""
    dtype = v.dtype
    idx = lax.axis_index(axis_name)
    A = jnp.broadcast_to(jnp.asarray(T_np).astype(dtype),
                         T_np.shape)                     # (p, p)
    b = v
    d = 1
    while d < nsh:
        perm = [(i, (i + d) % nsh) for i in range(nsh)]
        A_in = lax.ppermute(A, axis_name, perm)
        b_in = lax.ppermute(b, axis_name, perm)
        have = idx >= d
        # compose: newer (A, b) after older (A_in, b_in)
        A_new = jnp.einsum("ab,bc->ac", A, A_in)
        b_new = jnp.einsum("ab,bc->ac", A, b_in) + b
        A = jnp.where(have, A_new, A)
        b = jnp.where(have, b_new, b)
        d *= 2
    # b now holds the inclusive prefix P_k; shift right for exclusive
    perm = [(i, (i + 1) % nsh) for i in range(nsh)]
    zin = lax.ppermute(b, axis_name, perm)
    return jnp.where(idx == 0, jnp.zeros_like(zin), zin)


def _shard_affine_suffix(T_np, v, axis_name, nsh):
    """Exclusive affine suffix over a mesh axis: shard k receives
    zin_k = sum_{j>k} T^{j-1-k} v_j (zin_{nsh-1} = 0) — the mirror of
    _shard_affine_prefix for right-to-left (anti-causal) chains."""
    dtype = v.dtype
    idx = lax.axis_index(axis_name)
    A = jnp.broadcast_to(jnp.asarray(T_np).astype(dtype), T_np.shape)
    b = v
    d = 1
    while d < nsh:
        perm = [(i, (i - d) % nsh) for i in range(nsh)]
        A_in = lax.ppermute(A, axis_name, perm)
        b_in = lax.ppermute(b, axis_name, perm)
        have = idx < nsh - d
        # S_k^{(2d)} = S_k^{(d)} + T^d S_{k+d}^{(d)}
        A_new = jnp.einsum("ab,bc->ac", A, A_in)
        b_new = b + jnp.einsum("ab,bc->ac", A, b_in)
        A = jnp.where(have, A_new, A)
        b = jnp.where(have, b_new, b)
        d *= 2
    perm = [(i, (i - 1) % nsh) for i in range(nsh)]
    zin = lax.ppermute(b, axis_name, perm)
    return jnp.where(idx == nsh - 1, jnp.zeros_like(zin), zin)


def _zero_input_response(ss, zin, n_local, dtype):
    """y[t] = w' A^t zin for t in [0, n_local): block-start states are
    AV^b zin (affine recurrence with zero input) plus one
    state-to-output matmul per block. zin: (p, C); returns
    (n_local, C)."""
    from ..filters.filt import _affine_rec
    V, p = ss.V, ss.p
    C = zin.shape[1]
    B = -(-n_local // V)
    Zstart = _affine_rec(ss.AV, jnp.zeros((C, B, p), dtype), zin)
    # _affine_rec returns states AFTER each step with z_{-1} = zin:
    # with zero input, state after block b is AV^{b+1} zin; we need
    # the state ENTERING block b, i.e. AV^b zin
    Zstart = jnp.concatenate([zin.T[:, None, :], Zstart[:, :-1]], axis=1)
    Ycorr = jnp.einsum("cbp,vp->cbv", Zstart,
                       jnp.asarray(ss.G).astype(dtype),
                       precision=lax.Precision.HIGHEST)
    return Ycorr.reshape(C, B * V)[:, :n_local].T


def shard_filtfilt(sos, g, x, mesh, time_axis="time", channel_axis=None):
    """Zero-phase (forward + anti-causal) SOS filtering across time
    shards — the distributed form of filters.filtfilt (reference
    Filters/filt.jl:245-360, SOS path :341-360), with the same
    odd-symmetric edge extrapolation and steady-state initial
    conditions.

    Structure: each shard runs BOTH block state-space passes locally
    from zero state; the (2*nsec, C) boundary states chain across
    shards with a log-depth ppermute prefix (forward) and suffix
    (anti-causal), and the tiny edge-extension transients (pad =
    6*nsec samples) are folded in closed form into the first/last
    shard's entering states via host tables. No data flips and no
    resharding: the anti-causal pass uses the time-mirrored tables
    (filters.filt._blockss_apply reverse=True).

    Arbitrary lengths: when n doesn't split into 128-multiple shards,
    the signal is extended in-array with the odd-symmetric back
    extension plus zeros and the anti-causal initial state is injected
    at the true extension end (_shard_filtfilt_padded)."""
    from ..filters.filt import (_blockss, _stack_cascade, _blockss_apply,
                                filt_stepstate_sos)
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    x = jnp.asarray(x)
    nsec = sos.shape[0]
    p = 2 * nsec
    cspec = () if (x.ndim == 1 or channel_axis is None) else (channel_axis,)
    spec = P(time_axis, *cspec)

    nsh = _ntime(mesh, time_axis)
    n = x.shape[0]
    pad = min(6 * nsec, n - 1)
    if n % nsh or (n // nsh) % 128 or pad + 2 > n // nsh:
        return _shard_filtfilt_padded(sos, g, x, mesh, time_axis, spec, nsh)
    nlocal = n // nsh

    ss = _blockss(*_stack_cascade(sos, float(g)))
    A = ss.A
    T_np = np.linalg.matrix_power(A, nlocal)
    # A^{k*nlocal} for k = 0..nsh-1 (propagates the edge-transient
    # entering states to every shard)
    Apow = np.empty((nsh, p, p))
    Apow[0] = np.eye(p)
    for k in range(1, nsh):
        Apow[k] = T_np @ Apow[k - 1]
    # tiny edge tables over the pad window (ss.powers has A^0..A^V)
    powers = ss.powers
    Apad = powers[pad]
    Kf = np.stack([powers[pad - 1 - j] @ ss.c
                   for j in range(pad)], axis=1)          # (p, pad)
    Kr = np.stack([powers[j] @ ss.c for j in range(pad)], axis=1)
    h = np.empty(pad)
    h[0] = float(ss.F[0, 0])                              # = d
    if pad > 1:
        h[1:] = (powers[: pad - 1] @ ss.c) @ _w_of(ss)
    i_, j_ = np.ogrid[:pad, :pad]
    Fpad = np.where(i_ >= j_, h[np.clip(i_ - j_, 0, pad - 1)], 0.0)
    Gpad = powers[:pad].transpose(0, 2, 1) @ _w_of(ss)    # (pad, p)
    zstack = np.swapaxes(filt_stepstate_sos(sos), 0, 1).reshape(p)

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
    def run(xs):
        flat = xs.reshape(xs.shape[0], -1)
        dtype = jnp.result_type(flat.dtype, jnp.float32)
        flat = flat.astype(dtype)
        C = flat.shape[1]
        idx = lax.axis_index(time_axis)
        zst = jnp.asarray(zstack, dtype)[:, None]         # (p, 1)
        prec = lax.Precision.HIGHEST

        # ---- forward pass ----
        z0 = jnp.zeros((p, C), dtype)
        y0, v = _blockss_apply(ss, flat, z0, need_state=True)
        # shard-0 front extension: ext = 2*x0 - x[pad:0:-1]; entering
        # state after filtering it from the steady-state init
        front = 2 * flat[:1] - flat[pad:0:-1]             # (pad, C)
        z_init = zst * front[0][None, :]
        z_e = (jnp.asarray(Apad).astype(dtype) @ z_init
               + jnp.einsum("pj,jc->pc", jnp.asarray(Kf).astype(dtype),
                            front, precision=prec))
        z_e = lax.psum(jnp.where(idx == 0, z_e, 0.0), time_axis)
        zin = _shard_affine_prefix(T_np, v, time_axis, nsh)
        zin = zin + jnp.einsum(
            "ab,bc->ac", jnp.asarray(Apow).astype(dtype)[idx], z_e,
            precision=prec)
        y1 = y0 + _zero_input_response(ss, zin, nlocal, dtype)

        # ---- back extension (forward through it, then reversed) ----
        exit_s = (jnp.asarray(T_np).astype(dtype) @ zin + v)
        back = 2 * flat[-1:] - flat[-2: -pad - 2: -1]     # (pad, C)
        y1b = (jnp.einsum("ij,jc->ic", jnp.asarray(Fpad).astype(dtype),
                          back, precision=prec)
               + jnp.einsum("ip,pc->ic", jnp.asarray(Gpad).astype(dtype),
                            exit_s, precision=prec))
        z_r0 = zst * y1b[-1][None, :]
        z_re = (jnp.asarray(Apad).astype(dtype) @ z_r0
                + jnp.einsum("pj,jc->pc", jnp.asarray(Kr).astype(dtype),
                             y1b, precision=prec))
        z_re = lax.psum(jnp.where(idx == nsh - 1, z_re, 0.0), time_axis)

        # ---- anti-causal pass ----
        yr, w = _blockss_apply(ss, y1, z0, need_state=True, reverse=True)
        zrin = _shard_affine_suffix(T_np, w, time_axis, nsh)
        zrin = zrin + jnp.einsum(
            "ab,bc->ac", jnp.asarray(Apow).astype(dtype)[nsh - 1 - idx],
            z_re, precision=prec)
        # reverse zero-input response == time-flipped forward response
        corr = _zero_input_response(ss, zrin, nlocal, dtype)[::-1]
        y2 = yr + corr
        return y2.reshape(xs.shape)

    return run(x)


def _shard_filtfilt_padded(sos, g, x, mesh, time_axis, spec, nsh):
    """shard_filtfilt for lengths that don't split into 128-multiple
    shards. The signal is extended with the actual odd-symmetric back
    extension followed by zeros, so the forward pass computes the
    back-extension response in-array; the anti-causal pass then zeroes
    the decay tail and injects its initial state zst*y1[n_inj-1] at the
    true extension end n_inj = n + pad, propagated per shard with host
    A-power tables (shards past the injection point take a row-shifted
    zero-input response via a dynamic slice)."""
    from ..filters.filt import (_blockss, _stack_cascade, _blockss_apply,
                                filt_stepstate_sos)
    nsec = sos.shape[0]
    p = 2 * nsec
    n_orig = x.shape[0]
    pad = min(6 * nsec, n_orig - 1)
    nlocal = max((-(-n_orig // nsh) + 127) // 128 * 128, 128)
    while nlocal * nsh - n_orig < pad or pad + 2 > nlocal:
        nlocal += 128
    N = nlocal * nsh
    n_inj = n_orig + pad

    # odd-symmetric back extension placed in-array, zeros beyond
    back = (2 * x[n_orig - 1:n_orig]
            - jnp.flip(x[n_orig - 1 - pad:n_orig - 1], 0))
    xe = _pad_time(jnp.concatenate([x, back], axis=0), N)

    ss = _blockss(*_stack_cascade(sos, float(g)))
    A = ss.A
    T_np = np.linalg.matrix_power(A, nlocal)
    Apow = np.empty((nsh, p, p))
    Apow[0] = np.eye(p)
    for k in range(1, nsh):
        Apow[k] = T_np @ Apow[k - 1]
    powers = ss.powers
    Apad = powers[pad]
    Kf = np.stack([powers[pad - 1 - j] @ ss.c
                   for j in range(pad)], axis=1)            # (p, pad)
    zstack = np.swapaxes(filt_stepstate_sos(sos), 0, 1).reshape(p)
    # per-shard back-injection propagation: shards ending at or before
    # n_inj propagate A^{n_inj-end}; the shard containing n_inj (and
    # any fully-padded shard) row-shifts the response instead
    ends = (np.arange(nsh) + 1) * nlocal
    Aadj = np.stack([np.linalg.matrix_power(A, int(max(n_inj - e, 0)))
                     for e in ends])
    sshift = np.clip(ends - n_inj, 0, nlocal).astype(np.int32)
    k_star = (n_inj - 1) // nlocal
    r_star = (n_inj - 1) % nlocal

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
    def run(xs):
        flat = xs.reshape(xs.shape[0], -1)
        dtype = jnp.result_type(flat.dtype, jnp.float32)
        flat = flat.astype(dtype)
        C = flat.shape[1]
        idx = lax.axis_index(time_axis)
        zst = jnp.asarray(zstack, dtype)[:, None]
        prec = lax.Precision.HIGHEST

        # ---- forward pass with closed-form front-extension state ----
        z0 = jnp.zeros((p, C), dtype)
        y0, v = _blockss_apply(ss, flat, z0, need_state=True)
        front = 2 * flat[:1] - flat[pad:0:-1]               # (pad, C)
        z_init = zst * front[0][None, :]
        z_e = (jnp.asarray(Apad).astype(dtype) @ z_init
               + jnp.einsum("pj,jc->pc", jnp.asarray(Kf).astype(dtype),
                            front, precision=prec))
        z_e = lax.psum(jnp.where(idx == 0, z_e, 0.0), time_axis)
        zin = _shard_affine_prefix(T_np, v, time_axis, nsh)
        zin = zin + jnp.einsum(
            "ab,bc->ac", jnp.asarray(Apow).astype(dtype)[idx], z_e,
            precision=prec)
        y1 = y0 + _zero_input_response(ss, zin, nlocal, dtype)

        # ---- anti-causal pass ----
        # initial state zst * y1[n_inj-1], extracted from its shard
        row = lax.psum(jnp.where(idx == k_star, y1[r_star], 0.0),
                       time_axis)
        z_inj = zst * row[None, :]
        # zero the forward decay tail past the extension end
        g_idx = idx * nlocal + jnp.arange(nlocal)
        y1m = jnp.where((g_idx < n_inj)[:, None], y1, 0.0)

        yr, w = _blockss_apply(ss, y1m, z0, need_state=True, reverse=True)
        zrin = _shard_affine_suffix(T_np, w, time_axis, nsh)
        corr0 = _zero_input_response(ss, zrin, nlocal, dtype)[::-1]
        zadj = jnp.einsum(
            "ab,bc->ac", jnp.asarray(Aadj).astype(dtype)[idx], z_inj,
            precision=prec)
        resp = _zero_input_response(ss, zadj, nlocal, dtype)[::-1]
        respp = jnp.concatenate([resp, jnp.zeros_like(resp)], axis=0)
        shifted = lax.dynamic_slice_in_dim(
            respp, jnp.asarray(sshift)[idx], nlocal, 0)
        y2 = yr + corr0 + shifted
        return y2.reshape(xs.shape)

    return run(xe)[:n_orig]


def _w_of(ss):
    """Recover the output map w from the block tables: G[0] = (A^0)'w."""
    return ss.G[0]


def shard_sosfilt(sos, g, x, mesh, time_axis="time", channel_axis=None):
    """Time-sharded biquad cascade via the stacked block state-space
    pass (filters.filt._blockss_apply): each shard filters its block
    from zero state in ONE fused pass, the (2*nsec, C) boundary states
    chain across shards with a log-depth ppermute prefix
    (_shard_affine_prefix), and the entering-state correction is the
    zero-input response — a tiny powers-of-A chain plus one G matmul.
    Distributed analogue of DF2TFilter state (Filters/filt.jl:122-230)
    without the reference's sequential block walk."""
    from ..filters.filt import (_blockss, _stack_cascade, _blockss_apply,
                                _affine_rec)
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    x = jnp.asarray(x)
    nsec = sos.shape[0]
    p = 2 * nsec
    cspec = () if (x.ndim == 1 or channel_axis is None) else (channel_axis,)
    spec = P(time_axis, *cspec)

    nsh = _ntime(mesh, time_axis)
    n_orig = x.shape[0]
    n_local = -(-n_orig // nsh)
    x = _pad_time(x, n_local * nsh)   # causal: padded tail sliced off

    ss = _blockss(*_stack_cascade(sos, float(g)))
    # whole-shard transition T = A^n_local (host, binary exponentiation)
    T_np = np.linalg.matrix_power(ss.A, n_local)

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
    def run(xs):
        flat = xs.reshape(xs.shape[0], -1)
        dtype = flat.dtype
        C = flat.shape[1]
        z0 = jnp.zeros((p, C), dtype)
        y0, v = _blockss_apply(ss, flat, z0, need_state=True)
        if nsh == 1:
            return y0.reshape(xs.shape)
        zin = _shard_affine_prefix(T_np, v, time_axis, nsh)   # (p, C)
        ycorr = _zero_input_response(ss, zin, n_local, dtype)
        return (y0 + ycorr).reshape(xs.shape)

    y = run(x)
    return y if y.shape[0] == n_orig else y[:n_orig]


def shard_stft_pow(x, n, noverlap, window, mesh, time_axis="time",
                   channel_axis=None, fs=1.0, onesided=True):
    """Time-sharded spectrogram/STFT power: each shard computes the
    windowed-segment PSDs of the segments *starting* inside it
    (pulling the n-hop halo from its right neighbor, like shard_welch)
    and keeps them — the output stays sharded over the segment axis
    (axis 0 of the returned (nseg, nfreq, *chans) array), the natural
    layout for downstream sharded reductions. Distributed form of the
    reference segment loop (periodograms.jl:746-759,828-897)."""
    x = jnp.asarray(x)
    win = None if window is None else jnp.asarray(window)
    hop = n - noverlap
    ntime = _ntime(mesh, time_axis)
    n_orig = x.shape[0]
    nlocal = -(-n_orig // (ntime * hop)) * hop
    x = _pad_time(x, nlocal * ntime)
    if noverlap > nlocal:
        raise ValueError("noverlap (the cross-shard halo) must not exceed "
                         "the local shard length")
    norm2 = float(n) if win is None else float(jnp.sum(win ** 2))
    nfreq = n // 2 + 1 if onesided else n
    cspec = () if (x.ndim == 1 or channel_axis is None) else (channel_axis,)
    in_spec = P(time_axis, *cspec)
    out_spec = P(time_axis, None, *cspec)

    @partial(shard_map, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec)
    def run(xs):
        halo_len = n - hop
        nsh = lax.axis_size(time_axis)
        if halo_len:
            perm = [(i, (i - 1) % nsh) for i in range(nsh)]
            halo = lax.ppermute(xs[:halo_len], time_axis, perm)
            idx = lax.axis_index(time_axis)
            halo = jnp.where(idx == nsh - 1, jnp.zeros_like(halo), halo)
            xcat = jnp.concatenate([xs, halo], axis=0)
        else:
            xcat = xs
        nseg = nlocal // hop
        starts = jnp.arange(nseg) * hop
        shard_idx = lax.axis_index(time_axis)
        gstart = shard_idx * nlocal + starts
        valid = (gstart + n <= n_orig).astype(xcat.dtype)
        q = -(-n // hop)
        need = (nseg + q) * hop
        xp = xcat if xcat.shape[0] >= need else jnp.pad(
            xcat, [(0, need - xcat.shape[0])] + [(0, 0)] * (xcat.ndim - 1))
        parts = [xp[j * hop: (nseg + j) * hop]
                 .reshape((nseg, hop) + xcat.shape[1:]) for j in range(q)]
        frames = jnp.concatenate(parts, axis=1)[:, :n]
        if win is not None:
            wshape = (1, n) + (1,) * (xcat.ndim - 1)
            frames = frames * win.reshape(wshape)
        F = (jnp.fft.rfft(frames, axis=1) if onesided
             else jnp.fft.fft(frames, axis=1))
        pw = jnp.abs(F) ** 2
        scale = np.full(pw.shape[1], 1.0 / (fs * norm2))
        if onesided:
            scale[1:] *= 2.0
            if n % 2 == 0:
                scale[-1] /= 2.0
        pw = pw * jnp.asarray(scale, pw.dtype).reshape(
            (1, pw.shape[1]) + (1,) * (pw.ndim - 2))
        return pw * valid.reshape((nseg,) + (1,) * (pw.ndim - 1))

    pw = run(x)
    freqs = (np.fft.rfftfreq(n, 1.0 / fs) if onesided
             else np.fft.fftfreq(n, 1.0 / fs))
    t = (np.arange(pw.shape[0]) * hop + n / 2) / fs
    return pw, freqs, t


def shard_spectrogram(x, n, noverlap, window, mesh, time_axis="time",
                      channel_axis=None, fs=1.0):
    """Sharded spectrogram (PSD mode); see shard_stft_pow. Segments
    whose window would run past the global signal end are zero rows on
    the owning shard (static SPMD shape), mirroring shard_welch's
    masking."""
    return shard_stft_pow(x, n, noverlap, window, mesh, time_axis,
                          channel_axis, fs=fs, onesided=True)


def shard_resample(h, ratio, x, mesh, time_axis="time", channel_axis=None):
    """Time-sharded streaming polyphase resample (rational ratio or
    integer interp/decim): the distributed form of FIRFilter's
    inputDeficit/history/phase state carry (reference
    stream_filt.jl:443-467).

    The stream state entering shard k after k*n_local consumed samples
    has an O(1) closed form (the kernels' commit algebra), so every
    shard's (deficit, phase) is host-precomputed; the per-shard phase
    shift folds into a row-shifted banded tap matrix G_k (a sharded
    operand), leaving one static-shape SPMD program: halo the
    tapsPerPhi-1 history from the left neighbor, one block matmul, and
    an output-count mask. The result equals chunked FIRFilter.filt
    exactly, sample for sample.

    Returns (y, out_counts): y is (nsh * out_max, *chans) sharded along
    axis 0 with each shard's tail zero-padded to out_max; out_counts
    gives the valid count per shard (use compact_shards to squeeze)."""
    from fractions import Fraction
    from ..filters.stream_filt import (FIRFilter, taps2pfb, outputlength,
                                       _tap_dtype)
    ratio = Fraction(ratio)
    L, M = ratio.numerator, ratio.denominator
    x = jnp.asarray(x)
    h = np.asarray(h)
    nsh = _ntime(mesh, time_axis)
    n_orig = x.shape[0]
    n_local = -(-n_orig // nsh)
    x = _pad_time(x, n_local * nsh)

    # polyphase bank and per-shard entry state (host O(nsh))
    pfb = taps2pfb(h, L)                    # (tapsPerPhi, L)
    taps = pfb.shape[0]
    hl = taps - 1                           # history halo length
    if hl > n_local:
        raise ValueError(
            f"per-phase history ({hl}) exceeds the per-shard length "
            f"({n_local}); xs[-hl:] would yield a short halo and wrong "
            f"boundary samples — use fewer time shards or longer input")
    pfb_t = pfb.T                           # (L, taps)
    ref = FIRFilter(h, ratio if (L > 1 or M > 1) else 1)
    states = []
    valid_counts = []
    k0 = ref.kernel
    for k in range(nsh):
        phi = getattr(k0, "phi_idx", 1)
        deficit = k0.input_deficit if hasattr(k0, "input_deficit") else 1
        states.append((deficit, phi))
        out_k = (outputlength(n_local - deficit + 1, ratio, phi)
                 if n_local >= deficit else 0)
        # valid outputs consume only the shard's real (unpadded) samples
        r_k = max(min(n_orig - k * n_local, n_local), 0)
        valid_counts.append(
            max(outputlength(r_k - deficit + 1, ratio, phi), 0)
            if r_k >= deficit else 0)
        k0.commit(n_local, out_k)
    out_counts = np.array(valid_counts)
    Bs = -(-out_counts // L)
    Bmax = int(Bs.max())
    out_max = Bmax * L
    # per-shard G with the deficit folded in as a row shift (so the
    # frame start is the static s0 = 0 for every shard)
    Ws = []
    Gs = []
    for d, phi in states:
        shift = d - 1
        offs = [shift + (phi - 1 + M * p) // L for p in range(L)]
        W = max(offs) + taps
        G = np.zeros((W, L), dtype=pfb_t.dtype)
        for p in range(L):
            G[offs[p]: offs[p] + taps, p] = pfb_t[(phi - 1 + M * p) % L]
        Ws.append(W)
        Gs.append(G)
    Wmax = max(Ws)
    Gstack = np.stack([np.pad(G, ((0, Wmax - G.shape[0]), (0, 0)))
                       for G in Gs])                       # (nsh, Wmax, L)
    counts = out_counts.reshape(nsh, 1)

    cspec = () if (x.ndim == 1 or channel_axis is None) else (channel_axis,)
    spec = P(time_axis, *cspec)
    dt = _tap_dtype(Gstack.dtype, x.dtype)
    Gj = jnp.asarray(Gstack, dt)
    cj = jnp.asarray(counts)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec, P(time_axis), P(time_axis)),
             out_specs=P(time_axis, *cspec))
    def run(xs, G, cnt):
        halo = _right_shift_halo(xs[-hl:], time_axis) if hl else None
        xcat = jnp.concatenate([halo, xs], axis=0) if hl else xs
        from ..filters.stream_filt import _block_matmul
        y = _block_matmul(xcat.astype(dt), G[0], 0, Bmax, M, Wmax,
                          out_max)                        # (out_max, *ch)
        j = jnp.arange(out_max).reshape((out_max,) + (1,) * (y.ndim - 1))
        return jnp.where(j < cnt[0, 0], y, 0)

    y = run(x, Gj, cj)
    return y, out_counts


def compact_shards(y, out_counts):
    """Squeeze the per-shard zero padding out of a shard_resample
    result: host-side index plan + one device take."""
    nsh = len(out_counts)
    out_max = y.shape[0] // nsh
    idx = np.concatenate([k * out_max + np.arange(c)
                          for k, c in enumerate(out_counts)])
    return jnp.take(y, jnp.asarray(idx), axis=0)


def shard_mt_spectrogram(x, config, n_overlap=None, mesh=None,
                         time_axis="time", channel_axis=None):
    """Time-sharded multitaper spectrogram: per-shard segment framing
    with right-neighbor halo (as shard_stft_pow) and the taper-weighted
    PSD reduction (ops.multitaper._mt_power) on each shard's segments.
    `config` is an MTConfig (segment geometry) and n_overlap the
    overlap in samples (default n>>1). Output stays sharded over the
    segment axis: (nseg, nfreq, *chans); invalid tail rows are zero."""
    from ..ops.multitaper import MTSpectrogramConfig, _mt_power
    if isinstance(config, MTSpectrogramConfig):
        n_overlap = config.n_overlap_samples
        config = config.mt_config
    x = jnp.asarray(x)
    n = config.n_samples
    if n_overlap is None:
        n_overlap = n >> 1
    hop = n - n_overlap
    ntime = _ntime(mesh, time_axis)
    n_orig = x.shape[0]
    nlocal = -(-n_orig // (ntime * hop)) * hop
    x = _pad_time(x, nlocal * ntime)
    if n_overlap > nlocal:
        raise ValueError("n_overlap (the cross-shard halo) must not "
                         "exceed the local shard length")
    cspec = () if (x.ndim == 1 or channel_axis is None) else (channel_axis,)
    in_spec = P(time_axis, *cspec)
    out_spec = P(time_axis, None, *cspec)

    @partial(shard_map, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec)
    def run(xs):
        halo_len = n - hop
        nsh = lax.axis_size(time_axis)
        if halo_len:
            perm = [(i, (i - 1) % nsh) for i in range(nsh)]
            halo = lax.ppermute(xs[:halo_len], time_axis, perm)
            idx = lax.axis_index(time_axis)
            halo = jnp.where(idx == nsh - 1, jnp.zeros_like(halo), halo)
            xcat = jnp.concatenate([xs, halo], axis=0)
        else:
            xcat = xs
        nseg = nlocal // hop
        starts = jnp.arange(nseg) * hop
        shard_idx = lax.axis_index(time_axis)
        gstart = shard_idx * nlocal + starts
        valid = (gstart + n <= n_orig)
        q = -(-n // hop)
        need = (nseg + q) * hop
        xp = xcat if xcat.shape[0] >= need else jnp.pad(
            xcat, [(0, need - xcat.shape[0])] + [(0, 0)] * (xcat.ndim - 1))
        parts = [xp[j * hop: (nseg + j) * hop]
                 .reshape((nseg, hop) + xcat.shape[1:]) for j in range(q)]
        frames = jnp.concatenate(parts, axis=1)[:, :n]   # (nseg, n, *ch)
        frames = jnp.moveaxis(frames, 1, -1)             # (nseg, *ch, n)
        pw = _mt_power(frames, config)                   # (nseg, *ch, nf)
        pw = jnp.moveaxis(pw, -1, 1)                     # (nseg, nf, *ch)
        return pw * valid.reshape((nseg,) + (1,) * (pw.ndim - 1))

    return run(x)


def shard_mt_cross_power_spectra(signal, mesh, config=None,
                                 shard_axis="time", fs=1.0, demean=False,
                                 freq_range=None, **kwargs):
    """Taper-sharded multitaper cross power spectra (distributed form
    of the chan x chan x freq x taper accumulation, reference
    multitaper.jl:544-651).

    The taper bank is split over the mesh axis `shard_axis` (each
    device rffts + accumulates S^{lm} for its tapers only), then one
    psum yields the full cross-spectral matrix replicated on every
    device. The signal (n_channels, n_samples) is replicated — the
    lm-pairing needs all channels on each device, so channels cannot
    shard, but the taper dimension is embarrassingly parallel and
    carries the whole FFT cost. Tapers pad to a multiple of the axis
    size with zero-weight zero tapers (contribute exactly 0).

    Returns CrossPowerSpectra identical to mt_cross_power_spectra.
    """
    from ..ops.multitaper import (MTConfig, MTCrossSpectraConfig,
                                  CrossPowerSpectra, _freq_mask)
    signal = jnp.asarray(signal)
    if jnp.iscomplexobj(signal):
        raise ValueError("only real signals supported (onesided)")
    n_channels, n_samples = signal.shape
    if isinstance(config, MTCrossSpectraConfig):
        if n_channels != config.n_channels:
            raise ValueError("channel count does not match config")
        demean = config.demean
        freq_range = config.freq_range
        config = config.mt_config
    elif config is None:
        config = MTConfig.create(n_samples, fs=fs, onesided=True, **kwargs)
    if not config.onesided:
        raise ValueError("cross power spectra are onesided")
    if demean:
        signal = signal - jnp.mean(signal, axis=1, keepdims=True)
    nsh = mesh.shape[shard_axis]
    # host: taper bank (ntapers, n) + weights, zero-padded to nsh | K
    tap = np.asarray(config.window_array).T            # (ntapers, n)
    w = 2.0 / np.asarray(config.r)                     # (ntapers,)
    K = tap.shape[0]
    Kp = -(-K // nsh) * nsh
    if Kp != K:
        tap = np.concatenate([tap, np.zeros((Kp - K, tap.shape[1]))])
        w = np.concatenate([w, np.zeros(Kp - K)])
    nfft = config.nfft
    nfreq = nfft // 2 + 1
    corr = np.ones(nfreq)
    corr[0] = 1 / np.sqrt(2)
    if nfft % 2 == 0:
        corr[-1] = 1 / np.sqrt(2)
    idx, freqs = _freq_mask(config.freq, freq_range)
    dt = signal.dtype
    tap_j = jnp.asarray(tap, dtype=dt)
    w_j = jnp.asarray(w, dtype=dt)
    corr_j = jnp.asarray(corr, dtype=dt)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(shard_axis), P(shard_axis)),
             out_specs=P())
    def run(s, tap_l, w_l):
        F = jnp.fft.rfft(s[:, None, :] * tap_l[None], n=nfft, axis=-1)
        F = F * corr_j                         # (nch, k_local, nfreq)
        if not isinstance(idx, slice):
            F = F[:, :, jnp.asarray(idx)]
        part = jnp.einsum("k,lkf,mkf->lmf", w_l, F, jnp.conj(F))
        return lax.psum(part, shard_axis)

    return CrossPowerSpectra(run(signal, tap_j, w_j), freqs)


def shard_mt_coherence(signal, mesh, config=None, shard_axis="time",
                       fs=1.0, demean=False, freq_range=None, **kwargs):
    """Pairwise channel coherences from the taper-sharded cross
    spectra (reference multitaper.jl:765-817). The coherence
    normalization runs replicated (it is O(nch^2 nfreq), negligible
    next to the sharded FFT/accumulation)."""
    from ..ops.multitaper import (Coherence, MTCoherenceConfig,
                                  coherence_from_cs)
    if isinstance(config, MTCoherenceConfig):
        config = config.cs_config
    cs = shard_mt_cross_power_spectra(
        signal, mesh, config=config, shard_axis=shard_axis, fs=fs,
        demean=demean, freq_range=freq_range, **kwargs)
    return Coherence(coherence_from_cs(cs.power), cs.freq)
