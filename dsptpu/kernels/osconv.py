"""Pallas TPU kernel: fused overlap-save FFT convolution.

The XLA tile-domain overlap-save path (ops/dspbase._conv_os_1d +
ops/mxfft.fft_tiles) already runs the four-step DFT as MXU matmuls,
but XLA materializes every stage of the complex arithmetic in HBM:
measured on v5e the 4096-tap 16ch x 10M bench conv spends 55 ms where
the useful matmul work is ~13 ms (precision HIGHEST vs HIGH made no
difference — fusion/bandwidth-bound, not MXU-bound). This kernel runs
the ENTIRE per-block pipeline in VMEM:

    overlapped framing (BlockSpec rows) -> pair two real frames into
    one complex frame -> four-step DFT (stage-1 matmul over sublanes,
    twiddle, stage-2 matmul over lanes) -> tile-domain H multiply ->
    mirrored inverse four-step -> write only the L valid samples

so each input sample crosses HBM ~1.2x and each output sample once.
Semantics match reference dspbase.jl:371-609 (overlap-save blocks with
per-block save region), restricted to 1-D real f32 signals x channels.

Geometry (v2 — zero-copy). nfft = N1*128 (N1 <= 128), block advance
L = hr*128, save S = nfft - L = srow*128 >= nv - 1. The signal is
consumed UNPADDED as (C, n/128, 128) rows: frame f covers rows
[f*hr - srow, f*hr - srow + N1), delivered by TWO BlockSpec views of
the same array at block indices p and max(p-1, 0) — the save-region
history rows come from the PREVIOUS block's tail (masked to the
zero-history at p == 0), and rows at/after the signal end are masked
to zero in-kernel so the ragged grid tail and the linear-convolution
tail read zeros, not garbage (out-of-bounds writes are dropped by
Pallas). The v1 front-padded wrapper spent ~4 ms per bench call in the
pad and output-slice relayouts this geometry deletes (every XLA
relayout of a 640 MB channel batch costs ~2 ms on v5e). Callers that
only need the first `nout` outputs (fftfilt trims the conv tail) pass
it through so the output array is sized exactly.

Four-step tables are the mxfft convention (j = j1*128 + j2, bin
k = k1 + N1*k2): w1[k1,j1] = e^{-2i pi k1 j1/N1} (symmetric),
tw[k1,j2] = e^{-2i pi k1 j2/nfft}, w2[j2,k2] = e^{-2i pi j2 k2/128}
(symmetric); the inverse stages use the conjugate tables with 1/nfft
folded into the last one, whose rows are pre-sliced to the valid
range [srow, N1) so the final matmul only computes the L samples
that are kept.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    pallas_available = True
except Exception:  # pragma: no cover
    pallas_available = False

__all__ = ["osconv_pallas", "osconv_supported", "pallas_available"]


def osconv_supported(nfft, nv, dtype):
    """Real f32, nfft = N1*128 with N1 <= 128 (lane width bounds the
    second four-step factor), and a lane-aligned advance that still
    covers the filter history."""
    if not pallas_available:
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if nfft % 128 or not (2 <= nfft // 128 <= 128):
        return False
    L = ((nfft - nv + 1) // 128) * 128
    # the save region (frame history, srow = N1 - hr rows) must fit in
    # the previous grid block, and the v3 roll-spliced frame pieces
    # take N1 rows of an A = 2*hr*Q block: N1 <= 8*hr at Q = 4
    return L >= 128 and (nfft // 128) <= 8 * (L // 128)


def _tables(nfft):
    N1 = nfft // 128
    k1 = np.arange(N1)
    w1 = np.exp(-2j * np.pi * np.outer(k1, k1) / N1)
    tw = np.exp(-2j * np.pi * np.outer(k1, np.arange(128)) / nfft)
    j2 = np.arange(128)
    w2 = np.exp(-2j * np.pi * np.outer(j2, j2) / 128)
    return w1, tw, w2


def _kernel(x1, x0, w1re, w1im, tw4re, tw4im, w2re, w2im, hQre, hQim,
            twQre, twQim, iw1re, iw1im, o_ref, *,
            N1, hr, srow, Q, A, nrows, prec):
    """v3 (round 4): all Q complex frame pairs batch through every
    stage as a handful of WIDE matmuls (q on lanes for the sublane-
    contracting stages 1 and inv-k1, q on sublanes for the lane-
    contracting stages 2 and inv-k2), and every complex multiply runs
    as 3 Karatsuba products instead of 4. The round-3 form issued ~66
    narrow N=128 matmuls per step; this one issues 12 wide ones for
    3/4 the FLOPs — the kernel was matmul-bound at 41% of the measured
    Mosaic f32 peak."""
    b = pl.program_id(1)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=prec)
    w1r, w1i = w1re[:], w1im[:]
    w1s = w1r + w1i
    t4r, t4i = tw4re[:], tw4im[:]          # (N1, Q*128) lane-tiled
    w2r, w2i = w2re[:], w2im[:]
    w2s = w2r + w2i
    w2d = w2r - w2i
    hQr, hQi = hQre[:], hQim[:]            # (Q*N1, 128) sublane-stacked
    tQr, tQi = twQre[:], twQim[:]
    i1r, i1i = iw1re[:], iw1im[:]
    i1s = i1r + i1i
    # zero rows at/after the signal end (ragged grid tail and the
    # linear-convolution tail read zeros, never OOB garbage); x0's
    # block is max(b-1, 0), masked entirely at b == 0 (zero history)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
    v1 = jnp.where(rows_i + b * A < nrows, x1[0], 0.0)
    v0 = jnp.where((rows_i + (b - 1) * A < nrows) & (b > 0), x0[0], 0.0)
    ridN = jax.lax.broadcasted_iota(jnp.int32, (N1, 128), 0)

    def piece(off):
        """Rows [off, off+N1) of the step's signal; off < 0 reaches
        into the previous block's tail via roll+where (Mosaic lowers
        no sublane-shifted concatenation)."""
        if off >= 0:
            return v1[off: off + N1, :]
        k = -off
        pv0 = pltpu.roll(v0, k, axis=0)[:N1]   # rows < k <- v0[A-k..]
        pv1 = pltpu.roll(v1, k, axis=0)[:N1]   # rows >= k <- v1[r-k]
        return jnp.where(ridN < k, pv0, pv1)

    VA = jnp.concatenate(
        [piece(q * 2 * hr - srow) for q in range(Q)], axis=1)
    VB = jnp.concatenate(
        [piece(q * 2 * hr + hr - srow) for q in range(Q)], axis=1)
    # stage 1 (contract j1, sublanes): B = W1 @ (VA + i VB), Karatsuba
    P1 = dot(w1r, VA)
    P2 = dot(w1i, VB)
    P3 = dot(w1s, VA + VB)
    bre = P1 - P2
    bim = P3 - P1 - P2
    # twiddle (lane-tiled tables)
    cre = bre * t4r - bim * t4i
    cim = bre * t4i + bim * t4r
    # q moves to sublanes for the lane-contracting stages
    CRE = jnp.concatenate(
        [cre[:, 128 * q: 128 * (q + 1)] for q in range(Q)], axis=0)
    CIM = jnp.concatenate(
        [cim[:, 128 * q: 128 * (q + 1)] for q in range(Q)], axis=0)
    # stage 2 (contract j2, lanes): X = C @ W2, Karatsuba
    XP1 = dot(CRE, w2r)
    XP2 = dot(CIM, w2i)
    XP3 = dot(CRE + CIM, w2s)
    xre = XP1 - XP2
    xim = XP3 - XP1 - XP2
    # tile-domain filter multiply (sublane-stacked tables)
    yre = xre * hQr - xim * hQi
    yim = xre * hQi + xim * hQr
    # inverse over k2: Y @ conj(W2), Karatsuba with d = -w2i
    YP1 = dot(yre, w2r)
    YP2 = dot(yim, w2i)
    YP3 = dot(yre + yim, w2d)
    dre = YP1 + YP2
    dim = YP3 - YP1 + YP2
    # conjugate twiddle
    ere = dre * tQr + dim * tQi
    eim = dim * tQr - dre * tQi
    # q back to lanes for the sublane-contracting inverse stage 1
    Ere = jnp.concatenate(
        [ere[N1 * q: N1 * (q + 1), :] for q in range(Q)], axis=1)
    Eim = jnp.concatenate(
        [eim[N1 * q: N1 * (q + 1), :] for q in range(Q)], axis=1)
    # inverse over k1, valid rows only: iw1 = conj(w1)/nfft pre-sliced
    # to [srow, N1) -> (hr, N1) @ (N1, Q*128), Karatsuba
    OP1 = dot(i1r, Ere)
    OP2 = dot(i1i, Eim)
    OP3 = dot(i1s, Ere + Eim)
    ore = OP1 - OP2
    oim = OP3 - OP1 - OP2
    for q in range(Q):
        oa = q * 2 * hr
        o_ref[0, oa:oa + hr, :] = ore[:, 128 * q: 128 * (q + 1)]
        o_ref[0, oa + hr:oa + 2 * hr, :] = oim[:, 128 * q: 128 * (q + 1)]


@functools.partial(jax.jit,
                   static_argnames=("nfft", "nv", "nout", "Q",
                                    "interpret", "precision"))
def _osconv_jit(u, vp, nfft, nv, nout, Q, interpret,
                precision="highest"):
    """u: (n, C) real f32 with n % 128 == 0; vp: (nfft,) f32
    zero-padded filter. Returns (nout, C) f32, the first nout samples
    of the linear convolution."""
    n, C = u.shape
    N1 = nfft // 128
    # the advance is the largest lane-aligned L whose save region
    # still covers the filter history
    L = ((nfft - nv + 1) // 128) * 128
    hr = L // 128
    srow = N1 - hr
    K = -(-nout // L)                    # frames needed
    steps = -(-(-(-K // 2)) // Q)        # Q complex pairs per step
    A = 2 * hr * Q
    nrows = n // 128
    xr = u.T.reshape(C, nrows, 128)

    w1, tw, w2 = _tables(nfft)
    f32 = np.float32
    iw1 = np.conj(w1)[srow:, :] / nfft
    tw4 = np.tile(tw, (1, Q))                   # (N1, Q*128) lane-tiled
    twQ = np.tile(tw, (Q, 1))                   # (Q*N1, 128) stacked
    tabs = [jnp.asarray(t.astype(f32)) for t in
            (w1.real, w1.imag, tw4.real, tw4.imag, w2.real, w2.imag)]
    twqtabs = [jnp.asarray(t.astype(f32)) for t in (twQ.real, twQ.imag)]
    # filter tiles in this kernel's (N1, 128) four-step convention,
    # computed inside the jit (eager complex einsum is unsupported on
    # some tunneled backends)
    vt = vp.reshape(N1, 128).astype(jnp.complex64)
    s1 = jnp.einsum("ij,ki->kj", vt,
                    jnp.asarray(w1.astype(np.complex64)),
                    precision=jax.lax.Precision.HIGHEST)
    s1 = s1 * jnp.asarray(tw.astype(np.complex64))
    Ht = jnp.einsum("kj,jl->kl", s1,
                    jnp.asarray(w2.astype(np.complex64)),
                    precision=jax.lax.Precision.HIGHEST)
    HtQ = jnp.tile(Ht, (Q, 1))                  # (Q*N1, 128) stacked
    htabs = [jnp.real(HtQ).astype(jnp.float32),
             jnp.imag(HtQ).astype(jnp.float32)]
    itabs = [jnp.asarray(iw1.real.astype(f32)),
             jnp.asarray(iw1.imag.astype(f32))]

    RO = -(-nout // 128)
    const = lambda shape: pl.BlockSpec(shape, lambda c, p: (0, 0),
                                       memory_space=pltpu.VMEM)
    # Mosaic does not lower Precision.HIGH for dot (measured on v5e:
    # "Unsupported dot precision: HIGH" at lowering) — the hoped-for
    # 3-pass middle ground between HIGHEST (6-pass) and DEFAULT (bf16)
    # is not expressible in a Pallas TPU kernel, so "high" aliases to
    # HIGHEST rather than failing at trace time.
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    out = pl.pallas_call(
        functools.partial(_kernel, N1=N1, hr=hr, srow=srow, Q=Q, A=A,
                          nrows=nrows, prec=prec),
        out_shape=jax.ShapeDtypeStruct((C, RO, 128), jnp.float32),
        grid=(C, steps),
        in_specs=[
            pl.BlockSpec((1, A, 128), lambda c, p: (c, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, 128),
                         lambda c, p: (c, jnp.maximum(p - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            const((N1, N1)), const((N1, N1)),
            const((N1, Q * 128)), const((N1, Q * 128)),
            const((128, 128)), const((128, 128)),
            const((Q * N1, 128)), const((Q * N1, 128)),
            const((Q * N1, 128)), const((Q * N1, 128)),
            const((hr, N1)), const((hr, N1)),
        ],
        out_specs=pl.BlockSpec((1, A, 128), lambda c, p: (c, p, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, xr, *tabs, *htabs, *twqtabs, *itabs)
    y = out.reshape(C, RO * 128)[:, :nout]
    return y.T


def osconv_pallas(u, v, nfft, interpret=False, Q=4, out_len=None,
                 precision="highest"):
    """Fused overlap-save convolution: u (n,) or (n, C) real f32 long
    input, v (nv,) real f32 filter. Returns the first
    out_len (default n + nv - 1, the full linear convolution) samples,
    (out_len, C) (or 1-D). Caller checks
    osconv_supported(nfft, len(v), f32)."""
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    vec = u.ndim == 1
    u2 = u[:, None] if vec else u
    n = u2.shape[0]
    nv = int(v.shape[0])
    nout = n + nv - 1 if out_len is None else min(int(out_len),
                                                  n + nv - 1)
    if n % 128:
        # appended zeros are exact (they are the conv's own zero tail)
        u2 = jnp.pad(u2, ((0, 128 - n % 128), (0, 0)))
    vp = jnp.pad(v.astype(jnp.float32), (0, nfft - nv))
    y = _osconv_jit(u2.astype(jnp.float32), vp, int(nfft), nv,
                    int(nout), int(Q), bool(interpret), precision)
    return y[:, 0] if vec else y
