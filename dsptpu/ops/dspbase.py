"""Core base ops: filt / conv / deconv / xcorr (device layer, JAX).

Capability parity with reference src/dspbase.jl (filt :14-154, deconv
:162-172, overlap-save conv :262-609, conv driver :709-817, xcorr
:820-898). TPU-first redesign, not a translation:

  * FIR filtering and direct convolution lower to
    `lax.conv_general_dilated`, which XLA tiles onto the MXU, instead
    of the reference's unrolled scalar loops (dspbase.jl:118-141).
  * Long-filter paths use overlap-save with *batched* segment FFTs —
    the segment axis becomes a leading batch dim so one rFFT call does
    all blocks (vs. the reference's sequential per-block plan execution,
    dspbase.jl:583-606). FFT sizes are powers of two (XLA/TPU FFT
    strongly prefers pow2; the reference's {2,3,5,7} `nextfastfft`
    sizes are FFTW-specific).
  * IIR filtering is a `lax.scan` over a vectorized transposed
    direct-form-II state recurrence — channels ride the VPU lanes.

All functions operate along axis 0 with arbitrary trailing channel
dims (matching the reference's column convention) and are
jit-compatible for static shapes.
"""

import math
import os as _os

import numpy as np
import jax.numpy as jnp
from jax import lax

# fused Pallas overlap-save conv (kernels/osconv.py): same switches as
# the other kernels — DSPTPU_NO_PALLAS=1 kills, DSPTPU_PALLAS=1 forces
# (interpret mode off-TPU), default = on for non-CPU backends
_PALLAS_OS = {"0": False, "1": True}.get(
    _os.environ.get("DSPTPU_PALLAS", ""), None)
if _os.environ.get("DSPTPU_NO_PALLAS", "") == "1":
    _PALLAS_OS = False


def _pallas_os_state():
    """(use, interpret) for the fused OS-conv kernel."""
    if _PALLAS_OS is False:
        return False, False
    import jax
    try:
        on_cpu = jax.devices()[0].platform in ("cpu",)
    except Exception:
        on_cpu = True
    if _PALLAS_OS is True:
        return True, on_cpu
    return (not on_cpu), False

__all__ = ["filt", "conv", "conv_with_offset", "deconv", "xcorr",
           "optimal_os_nfft"]

# Crossover between direct and FFT convolution, in units of
# len(u)*len(v) (reference dspbase.jl:724 uses 2^16 for FFTW; the MXU
# makes direct conv relatively cheaper, so the crossover is higher).
_CONV_DIRECT_CUTOFF = 1 << 18

# FIR tap count above which filt() switches from the block-Toeplitz
# MXU matmul to batched overlap-save FFTs. Measured crossover on TPU
# v5e (the matmul hits ~40x the XLA-FFT path at 127 taps; FFT wins for
# long filters where the Toeplitz FLOP count ~2*n*(T+nb) explodes).
# Reference analogue: SMALL_FILT_CUTOFF = 66, dspbase.jl:3.
_FIR_OS_CUTOFF = 512


def _as_1d(c, name):
    c = jnp.asarray(c)
    if c.ndim == 0:
        c = c[None]
    if c.ndim != 1:
        raise ValueError(f"{name} must be a scalar or 1-D array")
    return c


def _flatten_channels(x):
    """(n, *chans) -> (n, C), plus a restore function."""
    shape = x.shape
    flat = x.reshape(shape[0], -1) if x.ndim > 1 else x[:, None]
    def restore(y):
        return y.reshape((y.shape[0],) + shape[1:])
    return flat, restore


# ---------------------------------------------------------------------------
# FIR via XLA convolution (MXU path)
# ---------------------------------------------------------------------------

def _fir_causal(b, x):
    """Causal FIR along axis 0 of x (n, C): y[n] = sum_k b[k] x[n-k]."""
    n, C = x.shape
    nb = b.shape[0]
    if jnp.iscomplexobj(x) or jnp.iscomplexobj(b):
        # XLA conv is real-only: expand complex product into 4 real convs
        xr, xi = jnp.real(x), jnp.imag(x)
        br, bi = jnp.real(b), jnp.imag(b)
        rr = _fir_causal(br, xr) - _fir_causal(bi, xi)
        ii = _fir_causal(br, xi) + _fir_causal(bi, xr)
        return rr + 1j * ii
    dtype = jnp.result_type(b.dtype, x.dtype)
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.result_type(dtype, jnp.float32)
    lhs = x.T[:, None, :].astype(dtype)          # (C, 1, n): batch, feat, time
    rhs = b[::-1][None, None, :].astype(dtype)   # (1, 1, nb)
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(nb - 1, 0)])
    return out[:, 0, :].T


def _fir_block_toeplitz(b, x):
    """Causal FIR as a block-Toeplitz matmul: outputs in blocks of T,
    block b multiplying the (T + nb - 1, T) banded tap matrix against
    its input window (frames from strided reshapes via the shared
    block-matmul kernel). ~40x the XLA-FFT overlap-save path for
    short/medium taps on TPU v5e. x: (n, C) real."""
    from ..filters.stream_filt import _block_matmul
    nb = b.shape[0]
    n, C = x.shape
    # block size: measured on v5e at nb=127/10M samples, T=512 runs
    # 2.3x faster than T=256 (1.9 ms vs 4.4 ms; larger T amortizes the
    # banded G zero-padding while staying comfortably in VMEM tiles)
    T = min(1024, max(512, -(-2 * nb // 128) * 128))
    W = T + nb - 1
    # banded Toeplitz G[w, t] = b[nb-1-w+t] (0 <= w-t < nb) built by the
    # tile+reshape trick: c has period W+1, so row t of the (T, W)
    # reshape is c shifted right by t — no gather (a traced-taps gather
    # of the (W, T) index table costs ~3 ms/call on v5e, more than the
    # FIR matmul itself)
    c = jnp.concatenate([jnp.flip(b).astype(x.dtype),
                         jnp.zeros((T,), x.dtype)])
    G = jnp.tile(c, T)[: T * W].reshape(T, W).T
    xcat = jnp.concatenate([jnp.zeros((nb - 1, C), x.dtype), x], axis=0)
    B = -(-n // T)
    return _block_matmul(xcat, G, 0, B, T, W, n)


# ---------------------------------------------------------------------------
# filt
# ---------------------------------------------------------------------------

def filt(b, a, x=None, si=None):
    """Filter x along axis 0 with the IIR/FIR filter described by
    coefficient vectors b (numerator) and a (denominator).

    `filt(b, x)` is FIR shorthand for `filt(b, 1, x)`. Matches the
    reference's transposed direct-form II semantics (dspbase.jl:26-105)
    including a[0] normalization. `si` optionally supplies the initial
    state (shape (max(len(a),len(b))-1, *channels)); when given, the
    final state is returned as a second output (the streaming contract
    used by DF2TFilter).
    """
    if x is None:
        b, a, x = b, None, a
    x = jnp.asarray(x)
    b = _as_1d(b, "b")
    if x.shape[0] == 0:
        raise ValueError("input must be nonempty")

    a_arr = None if a is None else jnp.asarray(a)
    if a_arr is None or a_arr.ndim == 0 or a_arr.size == 1:
        # pure FIR: normalize by a0 if given
        if a_arr is not None:
            b = b / a_arr.reshape(-1)[0]
        if si is None:
            flat, restore = _flatten_channels(x)
            nb, n = b.shape[0], flat.shape[0]
            inexact = jnp.issubdtype(jnp.result_type(b.dtype, flat.dtype),
                                     jnp.inexact)
            cplx = jnp.iscomplexobj(flat) or jnp.iscomplexobj(b)
            if inexact and nb > _FIR_OS_CUTOFF and n > nb:
                # long taps: batched overlap-save FFTs
                return restore(_conv_os_1d(flat, b, out_len=n)[:n])
            if inexact and not cplx and 1 < nb and n >= 4 * nb:
                # short/medium taps: fused Pallas row-shift FIR when
                # available (measured 5.1x the block-Toeplitz matmul at
                # 127 taps on v5e), else block-Toeplitz on the MXU
                if (n >= 32768 and jnp.result_type(b.dtype, flat.dtype)
                        == jnp.dtype(jnp.float32)):
                    from ..kernels.fir import fir_pallas, fir_supported
                    use_k, interp = _pallas_os_state()
                    if use_k and fir_supported(nb, jnp.float32):
                        rows = -(-n // 128)
                        # A=2048 measured best for the v3 wide-matmul
                        # kernel (0.130 ms / 39.1 TF/s at 127 taps x
                        # 10M on v5e — at the measured Mosaic f32
                        # matmul peak)
                        A = min(2048, max(64, -(-rows // 32) * 8))
                        return restore(fir_pallas(
                            flat.astype(jnp.float32), b, A=A,
                            interpret=interp))
                return restore(_fir_block_toeplitz(b, flat))
            return restore(_fir_causal(b, flat))
        a = jnp.ones((1,), b.dtype)

    a = _as_1d(a, "a")
    return _filt_iir(b, a, x, si)


def _filt_iir(b, a, x, si=None):
    sz = max(a.shape[0], b.shape[0]) - 1
    dtype = jnp.result_type(b.dtype, a.dtype, x.dtype)
    if not (jnp.issubdtype(dtype, jnp.floating)
            or jnp.issubdtype(dtype, jnp.complexfloating)):
        dtype = jnp.result_type(dtype, jnp.float32)
    # Fast path: concrete real *stable* coefficients run through the
    # blocked parallel recurrence (host-precomputed power tables,
    # filters/filt.py) instead of the sequential per-sample scan.
    # Unstable denominators (e.g. deconv's polynomial division) keep
    # the sequential form: their transition powers overflow.
    fast = None
    try:
        bh = np.asarray(b, dtype=np.float64)
        ah = np.asarray(a, dtype=np.float64)
        if sz > 0 and not (np.iscomplexobj(b) or np.iscomplexobj(a)):
            roots = np.roots(ah / ah[0]) if len(ah) > 1 else np.zeros(0)
            if len(roots) == 0 or np.max(np.abs(roots)) < 1.0 - 1e-9:
                fast = (bh, ah)
    except Exception:  # traced coefficients -> sequential path
        fast = None
    if fast is not None:
        from ..filters.filt import _affine_apply
        bh, ah = fast
        scale = ah[0]
        bp = np.zeros(sz + 1)
        bp[: len(bh)] = bh / scale
        ap = np.zeros(sz + 1)
        ap[: len(ah)] = ah / scale
        flat, restore = _flatten_channels(x.astype(dtype))
        z0 = (jnp.zeros((sz, flat.shape[1]), dtype) if si is None
              else jnp.asarray(si, dtype).reshape(sz, flat.shape[1]))
        y, zf = _affine_apply(bp, ap, flat, z0)
        y = restore(y)
        if si is not None:
            return y, zf.reshape((sz,) + x.shape[1:])
        return y
    a = a.astype(dtype)
    b = b.astype(dtype)
    b = b / a[0]
    a = a / a[0]
    bp = jnp.zeros(sz + 1, dtype).at[: b.shape[0]].set(b)
    ap = jnp.zeros(sz + 1, dtype).at[: a.shape[0]].set(a)

    flat, restore = _flatten_channels(x.astype(dtype))
    C = flat.shape[1]
    if si is None:
        z0 = jnp.zeros((sz, C), dtype)
    else:
        z0 = jnp.asarray(si, dtype).reshape(sz, C)

    b_tail = bp[1:][:, None]   # (sz, 1)
    a_tail = ap[1:][:, None]
    b0 = bp[0]

    def step(z, xt):
        # xt: (C,) ; z: (sz, C). Transposed DF-II update, vectorized
        # over channels (reference dspbase.jl:69-92).
        y = b0 * xt + z[0]
        z_shift = jnp.concatenate([z[1:], jnp.zeros((1, C), dtype)], axis=0)
        z_new = z_shift + b_tail * xt[None, :] - a_tail * y[None, :]
        return z_new, y

    z_final, y = lax.scan(step, z0, flat)
    y = restore(y)
    if si is not None:
        return y, z_final.reshape((sz,) + x.shape[1:])
    return y


# ---------------------------------------------------------------------------
# deconv
# ---------------------------------------------------------------------------

def deconv(b, a):
    """Polynomial division: c with b = conv(a, c) + r
    (reference dspbase.jl:155-172)."""
    b = _as_1d(b, "b")
    a = _as_1d(a, "a")
    if b.shape[0] < a.shape[0]:
        return jnp.zeros(1, jnp.result_type(b.dtype, a.dtype))
    delta = jnp.zeros(b.shape[0] - a.shape[0] + 1,
                      jnp.result_type(b.dtype, a.dtype)).at[0].set(1)
    return filt(b, a, delta)


# ---------------------------------------------------------------------------
# conv
# ---------------------------------------------------------------------------

def optimal_os_nfft(nu, nv):
    """Pick the overlap-save FFT size minimizing cost per output
    sample, restricted to powers of two (cost model after reference
    dspbase.jl:262-291, with a pow2 constraint for the TPU FFT and an
    extra additive log-term weight measured on TPU v5e: the XLA TPU
    FFT's per-point cost grows faster than log2(n), so mid-size blocks
    win over the FFTW-optimal larger ones)."""
    from . import mxfft
    first = max(2 * nv, 8)
    nfft = 1 << (first - 1).bit_length()
    best, best_cost = nfft, None
    n = nfft
    while n <= 4 * (nu + nv - 1):
        L = n - nv + 1
        if L > 0:
            if nv >= 2048 and mxfft.mx_supported(n):
                # four-step MXU path: per-point matmul work is
                # l1 + l2 ~ 2*sqrt(n), not log n (measured v5e:
                # nv=4096 optimum is 16384, not the log-model 65536)
                l1, l2 = mxfft._split(n)
                cost = (n * (l1 + l2) / 24.0) / L
            else:
                cost = (n * (math.log2(n) + 3)) / L
            if best_cost is None or cost < best_cost:
                best, best_cost = n, cost
        n *= 2
    return best


def _conv_fft_simple(u, v, outsize):
    """Single padded FFT (reference dspbase.jl:611-644). N-D capable."""
    from ..utils.fftutil import fftintype
    dtype = fftintype(jnp.result_type(u.dtype, v.dtype))
    cplx = jnp.issubdtype(dtype, jnp.complexfloating)
    nffts = tuple(1 << (s - 1).bit_length() for s in outsize)
    axes = tuple(range(len(outsize)))
    if cplx:
        uf = jnp.fft.fftn(u, s=nffts, axes=axes)
        vf = jnp.fft.fftn(v, s=nffts, axes=axes)
        out = jnp.fft.ifftn(uf * vf, axes=axes)
    else:
        uf = jnp.fft.rfftn(u.astype(dtype), s=nffts, axes=axes)
        vf = jnp.fft.rfftn(v.astype(dtype), s=nffts, axes=axes)
        out = jnp.fft.irfftn(uf * vf, s=nffts, axes=axes)
    return out[tuple(slice(0, s) for s in outsize)].astype(dtype)


def _os_frames(up, K, L, W):
    """Overlapped frames up[..., k*L : k*L + W] for k < K, built from
    shifted strided reshapes (no gather — a gather here cost ~3x on
    TPU). up: (..., total) with total >= (K + ceil((W-L)/L)) * L.
    Returns (..., K, W)."""
    q = -(-(W - L) // L)
    parts = [up[..., j * L:(K + j) * L].reshape(up.shape[:-1] + (K, L))
             for j in range(q + 1)]
    return jnp.concatenate(parts, axis=-1)[..., :W]


def _conv_os_1d(u, v, nfft=None, out_len=None):
    """Batched overlap-save convolution along axis 0; u is the long
    input (n, *chans), v the 1-D filter. TPU-first replacement for the
    reference's sequential per-block loop (dspbase.jl:490-609): one
    batched rFFT covers every block of every channel, channels ride as
    leading batch dims so the FFT runs on the innermost axis, and
    frames come from strided reshapes instead of gathers. out_len
    (default full linear convolution) truncates the output — callers
    that discard the conv tail (fftfilt) pass it through so the fused
    kernel sizes its output exactly (an XLA slice of a 640 MB channel
    batch costs ~2 ms on v5e)."""
    from ..utils.fftutil import fftintype
    nu, nv = u.shape[0], v.shape[0]
    nout = nu + nv - 1 if out_len is None else min(out_len, nu + nv - 1)
    dtype = fftintype(jnp.result_type(u.dtype, v.dtype))
    cplx = jnp.issubdtype(dtype, jnp.complexfloating)
    if nfft is None:
        nfft = optimal_os_nfft(nu, nv)
    elif nfft < nv:
        raise ValueError("nfft must be at least the filter length")
    if not cplx and jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        from ..kernels.osconv import osconv_supported, osconv_pallas
        use_k, interp = _pallas_os_state()
        if use_k and osconv_supported(nfft, nv, dtype):
            u2 = u.astype(dtype).reshape(nu, -1)
            y = osconv_pallas(u2, v.astype(dtype), nfft,
                              interpret=interp, out_len=nout)
            return y.reshape((nout,) + u.shape[1:])
    L = nfft - nv + 1
    # lane-align the block advance: a misaligned L makes every framing
    # and reassembly copy cross vector lanes (measured 49 ms of a
    # 165 ms conv on v5e just building frames at L = 28673); shrinking
    # L to a multiple of 128 costs < 0.5% extra blocks and keeps every
    # strided reshape aligned. The save region S = nfft - L >= nv - 1
    # still carries the full filter history.
    if L >= 256:
        L = (L // 128) * 128
    S = nfft - L                                 # save size, >= nv - 1
    K = -(-nout // L)  # ceil
    q = -(-S // L)

    uc = jnp.moveaxis(u.astype(dtype), 0, -1)    # (*chans, n)
    pad_front = S
    total = (K + q) * L
    pad = [(0, 0)] * (u.ndim - 1) + [(pad_front, total - nu - pad_front)]
    up = jnp.pad(uc, pad)

    frames = _os_frames(up, K, L, nfft)          # (*chans, K, nfft)
    # long transforms in f32 run as four-step MXU matmuls (mxfft);
    # float64 (CPU parity) and short sizes keep the native FFT
    from . import mxfft
    use_mx = (mxfft.mx_supported(nfft)
              and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                       jnp.dtype(jnp.complex64)))
    fftm = mxfft if use_mx else jnp.fft
    if use_mx:
        # transform-domain multiply in the four-step TILE domain (skips
        # both bin-order transposes), and for real input two frames
        # ride one complex FFT: z = x_a + i x_b, and because conv with
        # the real filter is complex-linear, ifft(fft(z) * H) separates
        # exactly as y_a + i y_b — the classic pairing trick with zero
        # unpack cost (reference runs one real FFT per block,
        # dspbase.jl:583-606).
        Ht = mxfft.fft_tiles(v.astype(dtype), nfft)
        if cplx:
            y = mxfft.ifft_tiles(mxfft.fft_tiles(frames, nfft) * Ht,
                                 nfft)
        else:
            if K & 1:
                zpad = jnp.zeros(frames.shape[:-2] + (1, nfft),
                                 frames.dtype)
                frames = jnp.concatenate([frames, zpad], axis=-2)
            z = lax.complex(frames[..., 0::2, :], frames[..., 1::2, :])
            yc = mxfft.ifft_tiles(mxfft.fft_tiles(z, nfft) * Ht, nfft)
            y = jnp.stack([jnp.real(yc), jnp.imag(yc)], axis=-2)
            y = y.reshape(frames.shape[:-2] + (-1, nfft))[..., :K, :]
    elif cplx:
        H = fftm.fft(v.astype(dtype), n=nfft)
        y = fftm.ifft(fftm.fft(frames, n=nfft, axis=-1) * H, axis=-1)
    else:
        H = fftm.rfft(v.astype(dtype), n=nfft)
        y = fftm.irfft(fftm.rfft(frames, n=nfft, axis=-1) * H, n=nfft,
                       axis=-1)
    y = y[..., S:]                               # (*chans, K, L) valid part
    y = y.reshape(u.shape[1:] + (K * L,))[..., :nout]
    return jnp.moveaxis(y, -1, 0).astype(dtype)


def _os_frames_axis(x, K, L, W, axis):
    """Overlapped frames along `axis`: replaces that axis (length >=
    (K + ceil((W-L)/L)) * L) with a (K, W) pair of axes in place,
    frame k covering x[..., k*L : k*L + W, ...]. Built from shifted
    strided reshapes (no gather)."""
    x = jnp.moveaxis(x, axis, -1)
    fr = _os_frames(x, K, L, W)                       # (rest..., K, W)
    return jnp.moveaxis(fr, (-2, -1), (axis, axis + 1))


def _conv_os_nd(u, v, outsize):
    """N-D overlap-save convolution: block-decompose each dimension
    where the cost model prefers small FFT blocks over one padded
    full-size FFT (the N-D analogue of reference dspbase.jl:371-609's
    per-dimension edge-block machinery). TPU-first: every dimension's
    frames come from shifted strided reshapes, all blocks batch into
    ONE rfftn over the trailing block axes, and memory stays
    O(prod(nu_d * nfft_d / L_d)) ~ a small multiple of the input
    instead of O(prod(outsize)) for the padded full FFT."""
    from ..utils.fftutil import fftintype
    dtype = fftintype(jnp.result_type(u.dtype, v.dtype))
    cplx = jnp.issubdtype(dtype, jnp.complexfloating)
    nd = u.ndim
    nffts, Ls, Ks, blocked = [], [], [], []
    for d in range(nd):
        nu_d, nv_d = u.shape[d], v.shape[d]
        full = 1 << max(outsize[d] - 1, 1).bit_length()
        if nu_d >= nv_d > 1:
            osn = optimal_os_nfft(nu_d, nv_d)
            if osn < full:
                L = osn - nv_d + 1
                nffts.append(osn)
                Ls.append(L)
                Ks.append(-(-outsize[d] // L))
                blocked.append(True)
                continue
        nffts.append(full)
        Ls.append(outsize[d])
        Ks.append(1)
        blocked.append(False)
    if not any(blocked):
        return _conv_fft_simple(u, v, outsize)

    up = u.astype(dtype)
    pads = []
    for d in range(nd):
        if blocked[d]:
            q = -(-(nffts[d] - Ls[d]) // Ls[d])
            total = (Ks[d] + q) * Ls[d]
            front = v.shape[d] - 1
            pads.append((front, total - front - u.shape[d]))
        else:
            pads.append((0, 0))
    up = jnp.pad(up, pads)

    # frame each blocked dim in turn; each framed axis becomes an
    # adjacent (K_d, W_d) pair in place, so the final layout is already
    # the interleaved block order and flattens with a plain reshape
    wpos = []
    p = 0
    for d in range(nd):
        if blocked[d]:
            up = _os_frames_axis(up, Ks[d], Ls[d], nffts[d], p)
            wpos.append(p + 1)
            p += 2
        else:
            wpos.append(p)
            p += 1
    axes = tuple(wpos)
    if cplx:
        Vf = jnp.fft.fftn(v.astype(dtype), s=nffts, axes=tuple(range(nd)))
        y = jnp.fft.ifftn(jnp.fft.fftn(up, s=nffts, axes=axes)
                          * Vf.reshape(_vshape(up.ndim, wpos, Vf.shape)),
                          axes=axes)
    else:
        Vf = jnp.fft.rfftn(v.astype(dtype), s=nffts, axes=tuple(range(nd)))
        y = jnp.fft.irfftn(jnp.fft.rfftn(up, s=nffts, axes=axes)
                           * Vf.reshape(_vshape(up.ndim, wpos, Vf.shape)),
                           s=nffts, axes=axes)
    # valid region per framed axis
    sl = [slice(None)] * up.ndim
    for d in range(nd):
        if blocked[d]:
            sl[wpos[d]] = slice(v.shape[d] - 1, v.shape[d] - 1 + Ls[d])
        else:
            sl[wpos[d]] = slice(0, Ls[d])
    y = y[tuple(sl)]
    y = y.reshape(tuple(Ks[d] * Ls[d] for d in range(nd)))
    return y[tuple(slice(0, s) for s in outsize)].astype(dtype)


def _vshape(ndim, wpos, vf_shape):
    """Broadcast shape placing the filter spectrum's nd axes at the
    framed-array's FFT axis positions."""
    shape = [1] * ndim
    for d, p in enumerate(wpos):
        shape[p] = vf_shape[d]
    return tuple(shape)


def _conv_direct(u, v, outsize):
    """Direct N-D full convolution on the MXU via XLA conv
    (replaces the reference's muladd loops, dspbase.jl:646-660)."""
    dtype = jnp.result_type(u.dtype, v.dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        rr = _conv_direct(jnp.real(u), jnp.real(v), outsize)
        ri = _conv_direct(jnp.real(u), jnp.imag(v), outsize)
        ir = _conv_direct(jnp.imag(u), jnp.real(v), outsize)
        ii = _conv_direct(jnp.imag(u), jnp.imag(v), outsize)
        return (rr - ii) + 1j * (ri + ir)
    if not jnp.issubdtype(dtype, jnp.floating):
        # exact integer convolution through the XLA conv with an
        # integer accumulator (float64 would lose exactness past 2^53;
        # a Python shift-and-add loop would emit u.size traced adds)
        nd = u.ndim
        acc = jnp.dtype(dtype)
        lhs = u.astype(acc)[None, None]
        rhs = jnp.flip(v.astype(acc))[None, None]
        pad = [(sv - 1, sv - 1) for sv in v.shape]

        def _int_conv(lhs, rhs):
            return lax.conv_general_dilated(
                lhs, rhs, window_strides=(1,) * nd, padding=pad,
                preferred_element_type=acc)[0, 0]

        import jax
        traced = isinstance(u, jax.core.Tracer)
        if not traced and jax.default_backend() != "cpu":
            # Integer conv lowering is unverified on accelerator
            # backends; exactness matters more than speed on this rare
            # path, so route it through the CPU backend eagerly.
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                out = jax.jit(_int_conv)(np.asarray(lhs), np.asarray(rhs))
            out = jnp.asarray(np.asarray(out))
        else:
            out = _int_conv(lhs, rhs)
        return out.astype(dtype)
    nd = u.ndim
    lhs = u.astype(dtype)[None, None]
    rhs = jnp.flip(v.astype(dtype))[None, None]
    pad = [(sv - 1, sv - 1) for sv in v.shape]
    out = lax.conv_general_dilated(lhs, rhs, window_strides=(1,) * nd,
                                   padding=pad)[0, 0]
    return out.astype(dtype)


def conv(u, v, A=None, algorithm="auto"):
    """Full convolution of same-rank arrays u and v (output size
    su+sv-1 per dim). `conv(u, v, A)` computes the separable 2-D
    convolution of column u, row v with matrix A (reference
    dspbase.jl:801-817). `algorithm` in {"auto", "fast", "direct",
    "fft", "fft_simple", "fft_overlapsave"} (reference dspbase.jl:674-757).
    """
    if A is not None:
        u = _as_1d(u, "u")
        v = _as_1d(v, "v")
        A = jnp.asarray(A)
        return conv(jnp.outer(u, v), A, algorithm=algorithm)

    u = jnp.asarray(u)
    v = jnp.asarray(v)
    if u.ndim != v.ndim:
        # pad trailing singleton dims (Julia broadcasts trailing dims)
        nd = max(u.ndim, v.ndim)
        u = u.reshape(u.shape + (1,) * (nd - u.ndim))
        v = v.reshape(v.shape + (1,) * (nd - v.ndim))
    outsize = tuple(su + sv - 1 for su, sv in zip(u.shape, v.shape))

    dtype = jnp.result_type(u.dtype, v.dtype)
    is_float = (jnp.issubdtype(dtype, jnp.floating)
                or jnp.issubdtype(dtype, jnp.complexfloating))

    if algorithm == "auto":
        algorithm = "fast" if is_float else "direct"
    if algorithm == "fast":
        if u.size * v.size < _CONV_DIRECT_CUTOFF:
            algorithm = "direct"
        elif u.ndim == 1:
            nv, nu = sorted((u.shape[0], v.shape[0]))
            algorithm = ("fft_overlapsave"
                         if optimal_os_nfft(nu, nv) < nu + nv - 1
                         else "fft_simple")
        else:
            # N-D: overlap-save decides per dimension and falls back to
            # the single padded FFT when no dimension blocks
            algorithm = "fft_overlapsave"
    if algorithm == "fft":
        algorithm = "fft_simple"

    if algorithm == "direct":
        return _conv_direct(u, v, outsize)
    if algorithm == "fft_simple":
        return _conv_fft_simple(u, v, outsize)
    if algorithm == "fft_overlapsave":
        if u.size < v.size:
            u, v = v, u
        if u.ndim != 1:
            return _conv_os_nd(u, v, outsize)
        return _conv_os_1d(u, v)
    raise ValueError(f"unknown convolution algorithm {algorithm!r}")


def conv_with_offset(u, v, u_offsets=None, v_offsets=None,
                     algorithm="auto"):
    """Offset-axes convolution: numpy analogue of the reference's
    OffsetArrays conv support (ext/OffsetArraysExt.jl:5,
    dspbase.jl:663-672). Julia attaches per-axis index offsets to the
    arrays themselves; here they ride alongside as `u_offsets` /
    `v_offsets` (int or per-axis tuple: the index of each array's
    first element on its global axis). Returns `(out, out_offsets)`
    with `out = conv(u, v)` and `out_offsets[d] = u_offsets[d] +
    v_offsets[d]` — the reference's output axis range
    `firstindex(u)+firstindex(v) : lastindex(u)+lastindex(v)` in
    offset form. Mixing offset and plain axes is the caller's choice
    (offsets default to 0), unlike Julia where it is a type error.
    """
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    nd = max(u.ndim, v.ndim)

    def norm(off, name):
        if off is None:
            return (0,) * nd
        if np.isscalar(off):
            off = (int(off),) * nd
        off = tuple(int(o) for o in off)
        if len(off) != nd:
            raise ValueError(f"{name} must have one offset per axis "
                             f"({nd}), got {len(off)}")
        return off

    uo = norm(u_offsets, "u_offsets")
    vo = norm(v_offsets, "v_offsets")
    out = conv(u, v, algorithm=algorithm)
    return out, tuple(a + b for a, b in zip(uo, vo))


# ---------------------------------------------------------------------------
# xcorr
# ---------------------------------------------------------------------------

def xcorr(u, v=None, padmode="none", scaling="none"):
    """Cross-correlation of vectors u and v; conjugates the *second*
    argument (MATLAB/scipy convention, reference dspbase.jl:829-898).
    padmode in {"none", "longest"}; scaling in {"none", "biased"}.
    """
    u = _as_1d(u, "u")
    v = u if v is None else _as_1d(v, "v")
    su, sv = u.shape[0], v.shape[0]

    if scaling == "biased" and su != sv:
        raise ValueError("scaling only valid for vectors of same length")
    if padmode == "longest":
        n = max(su, sv)
        if su < n:
            u = jnp.pad(u, (0, n - su))
        if sv < n:
            v = jnp.pad(v, (0, n - sv))
    elif padmode != "none":
        raise ValueError("padmode must be either 'none' or 'longest'")

    res = conv(u, jnp.flip(jnp.conj(v)))
    if scaling == "biased":
        res = res / su
    elif scaling != "none":
        raise ValueError("scaling must be either 'none' or 'biased'")
    return res
