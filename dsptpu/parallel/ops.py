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

__all__ = ["shard_fir", "shard_fftfilt", "shard_welch", "shard_sosfilt"]


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
        y = _conv_os_1d(flat, b)[: flat.shape[0]]
    else:
        y = _fir_causal(b, flat)
    return y[nb - 1:].reshape((xcat.shape[0] - nb + 1,) + xcat.shape[1:])


def shard_fir(b, x, mesh, time_axis="time", channel_axis=None):
    """Causal FIR filt along axis 0, time-sharded with halo exchange.
    len(x) must divide evenly over the 'time' mesh axis and each local
    block must be >= nb-1 samples."""
    b = jnp.asarray(b)
    x = jnp.asarray(x)
    nb = b.shape[0]
    spec = (P(time_axis) if x.ndim == 1 or channel_axis is None
            else P(time_axis, channel_axis))

    @partial(shard_map, mesh=mesh, in_specs=(P(), spec), out_specs=spec)
    def run(b, xs):
        halo = _right_shift_halo(xs[-(nb - 1):], time_axis)
        return _fir_local(b, jnp.concatenate([halo, xs], axis=0))

    return run(b, x)


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
    neighbor), then psums the per-shard sums. The local shard length
    must be a multiple of hop = n - noverlap. Returns (psd, freqs)
    with psd replicated across the mesh.
    """
    x = jnp.asarray(x)
    win = jnp.asarray(window)
    hop = n - noverlap
    ntime = int(np.prod([d for ax, d in zip(mesh.axis_names, mesh.devices.shape)
                         if ax == time_axis]))
    nlocal = x.shape[0] // ntime
    if x.shape[0] % ntime or nlocal % hop:
        raise ValueError("signal length must split into time shards that "
                         "are a multiple of hop = n - noverlap")
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
        valid = (gstart + n <= x.shape[0]).astype(xcat.dtype)
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


def shard_sosfilt(sos, g, x, mesh, time_axis="time", channel_axis=None):
    """Time-sharded biquad cascade. Within each shard the recurrence
    runs as the O(log n) associative scan; across shards only the
    per-section 2-vector boundary states travel, chained with an
    in-shard-computed transition (state-carry protocol, the distributed
    analogue of DF2TFilter state, Filters/filt.jl:122-230)."""
    from ..filters.filt import _biquad_apply
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    x = jnp.asarray(x)
    nsec = sos.shape[0]
    cspec = () if (x.ndim == 1 or channel_axis is None) else (channel_axis,)
    spec = P(time_axis, *cspec)

    nsh = int(np.prod([d for ax, d in zip(mesh.axis_names,
                                          mesh.devices.shape)
                       if ax == time_axis]))
    n_local = x.shape[0] // nsh
    if x.shape[0] % nsh:
        raise ValueError("signal length must divide the time shards")

    # Host tables per section: zero-input responses yr_j[t] = (M^{t+1}
    # e_j)[0] and the whole-shard transition T = M^{n_local}. Only the
    # (2, C) boundary summaries travel over ICI (all_gather); each
    # shard then corrects its zero-ic output by linearity.
    from ..filters.filt import _companion_powers
    tables = []
    for k in range(nsec):
        pw = _companion_powers([1.0, sos[k, 3], sos[k, 4]], n_local)
        # zero-input output at step t is (M^t z_in)[0] (y_t = z1_{t-1})
        tables.append((pw[:n_local, 0, 0].copy(),
                       pw[:n_local, 0, 1].copy(), pw[n_local]))

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
    def run(xs):
        flat = xs.reshape(xs.shape[0], -1)
        idx = lax.axis_index(time_axis)
        y = flat
        for k in range(nsec):
            z0 = jnp.zeros((2, y.shape[1]), y.dtype)
            y0, v = _biquad_apply(*sos[k], y, z0)
            yr1_np, yr2_np, T_np = tables[k]
            if nsh > 1:
                vs = lax.all_gather(v, time_axis)        # (nsh, 2, C)
                tpows = jnp.asarray(
                    np.stack([np.linalg.matrix_power(T_np, j)
                              for j in range(nsh)])).astype(y.dtype)
                zin = jnp.zeros_like(v)
                for j in range(nsh - 1):
                    p = jnp.clip(idx - 1 - j, 0, nsh - 1)
                    term = jnp.einsum("ab,bc->ac", tpows[p], vs[j])
                    zin = zin + jnp.where(j < idx, term,
                                          jnp.zeros_like(term))
                yr1 = jnp.asarray(yr1_np).astype(y.dtype)[:, None]
                yr2 = jnp.asarray(yr2_np).astype(y.dtype)[:, None]
                y = y0 + yr1 * zin[0][None, :] + yr2 * zin[1][None, :]
            else:
                y = y0
        y = y * jnp.asarray(g, y.dtype)
        return y.reshape(xs.shape)

    return run(x)
