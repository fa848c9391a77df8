"""Pallas TPU kernel: fused windowed-segment DFT (STFT / Welch / PSD).

The reference's hot loop walks segments one at a time through an FFTW
plan (periodograms.jl:746-759, multitaper.jl:143-153). The XLA path
already batches every segment into one rFFT, but measured on TPU v5e
the XLA FFT runs far below both rooflines. This kernel instead maps
the transform onto the MXU with a four-step (Cooley-Tukey N = N1*128)
real DFT whose long stage is a dense (frames, 128) @ (128, 128)
complex matmul, and fuses the entire per-segment pipeline —

    overlapped framing (row-plane DMA) -> window multiply ->
    radix-N1 first stage (VPU) -> twiddle -> 128-DFT matmul (MXU) ->
    |.|^2 -> segment accumulation (Welch) or per-frame output

— into one pass over HBM: the signal is read once; frames and spectra
never round-trip to HBM.

Index math: a frame of nfft = N1*128 samples starting at b*hop
(hop % 128 == 0) is N1 rows of the (nrows, 128) row-major signal view,
rows hr*b + j1 for j1 < N1, hr = hop/128. Rows are regrouped into hr
interleaved row planes Q[m][i] = rows[hr*i + m] — on TPU by ONE fused
pallas transpose+regroup pass (kernels/transpose.regroup_planes_pallas,
270 GB/s; the round-3 XLA transpose + swapaxes prep cost more than the
kernel itself) — so each grid step DMAs hr contiguous row blocks and
frame j1-planes become *static sublane-offset* slices
Q[j1 % hr][b + j1//hr], the Mosaic-friendly replacement for strided
framing.

DFT decomposition (j = j2 + 128*j1, k = k1 + N1*k2):
    X[k1 + N1*k2] = sum_j2 W128[k2, j2] * T[k1, j2] *
                    (sum_j1 WN1[k1, j1] * x[j2 + 128*j1])
with twiddle T[k1, j2] = exp(-2i pi j2 k1 / nfft). The first stage is
<= N1^2 scaled (TB, 128) tile adds on the VPU; the second is the MXU
matmul. Bin k of the length-nfft DFT lives at (k1, k2) = (k % N1,
k // N1) of the (N1, 128) output tile.
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

__all__ = ["stft_pow_pallas", "stft_supported", "bins_from_tile",
           "onesided_bins_from_tile", "pallas_available"]


def stft_supported(nfft, hop, dtype):
    """This kernel handles f32 real input with lane-aligned geometry."""
    return (pallas_available and nfft % 128 == 0 and hop % 128 == 0
            and 2 <= nfft // 128 <= 16
            and jnp.dtype(dtype) == jnp.float32)


def _tables(nfft, N1, win):
    """Host tables: first-stage DFT (N1, N1) (returned as numpy, baked
    into the kernel as scalars), twiddles (N1, 128), second-stage DFT
    (128, 128), window planes (N1, 128)."""
    j1 = np.arange(N1)
    w1 = np.exp(-2j * np.pi * np.outer(j1, j1) * 128.0 / nfft)
    j2 = np.arange(128)
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / nfft)
    k2 = np.arange(128)
    w2 = np.exp(-2j * np.pi * np.outer(j2, k2) * N1 / nfft)
    wp = (np.asarray(win, np.float64).reshape(N1, 128) if win is not None
          else np.ones((N1, 128)))
    f32 = np.float32
    return (w1.real, w1.imag, tw.real.astype(f32), tw.imag.astype(f32),
            w2.real.astype(f32), w2.imag.astype(f32), wp.astype(f32))


def _stage1_fft(planes, N1):
    """First-stage DFT over the j1 planes as a radix-2
    decimation-in-time FFT expression tree with shared subexpressions
    (python-object reuse dedups the traced graph): ~N1 log2 N1 scaled
    tile adds instead of the direct form's ~N1^2/2 — the kernel is
    VMEM-tile-op-bound, so stage-1 op count is the welch/spectrogram
    runtime lever. `None` stands for an identically-zero tile; +-1 and
    +-i twiddles fold into adds/swaps. Returns [(re, im)] for all k1
    (the caller indexes k1 <= N1//2; dead rows are DCE'd)."""
    def add(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a + b

    def sub(a, b):
        if b is None:
            return a
        if a is None:
            return -b
        return a - b

    def scale(c, a):
        if a is None or abs(c) < 1e-12:
            return None
        if abs(c - 1.0) < 1e-12:
            return a
        if abs(c + 1.0) < 1e-12:
            return -a
        return a * float(c)

    def fft(xs):
        n = len(xs)
        if n == 1:
            return [xs[0]]
        E = fft(xs[0::2])
        O = fft(xs[1::2])
        out = [None] * n
        for k in range(n // 2):
            wre = float(np.cos(-2.0 * np.pi * k / n))
            wim = float(np.sin(-2.0 * np.pi * k / n))
            ore, oim = O[k]
            tre = sub(scale(wre, ore), scale(wim, oim))
            tim = add(scale(wre, oim), scale(wim, ore))
            ere, eim = E[k]
            out[k] = (add(ere, tre), add(eim, tim))
            out[k + n // 2] = (sub(ere, tre), sub(eim, tim))
        return out

    return fft([(p, None) for p in planes])


def _kernel(q_hbm, w2cat, twt, wp, o_ref, scratch, sem, *,
            w1re, w1im, TB, N1, rows, hr, pad, nblocks, prec,
            accum, valid_last):
    """Grid (C*nblocks,) linearized; step i handles (c, b) =
    divmod(i, nblocks). q_hbm: (C, hr, nrq, 128) regrouped row planes;
    scratch (2, hr, pad, 128), double-buffered: step i waits on the
    copies step i-1 started for it and prefetches step i+1's planes —
    manual DMAs otherwise SERIALIZE with compute (no Mosaic auto-
    pipelining; measured ~20% of the welch pass). o_ref:
    (1, 1, rows, 128) PSD accumulator block when accum, else
    (1, 1, N1, TB, 128) per-frame block. For a one-sided PSD only
    rows = N1//2 + 1 k1-rows are emitted: real input gives
    |X[k]| = |X[nfft-k]|, and bin nfft-k lives at (N1-k1, 127-k2) —
    the mirrored half is pure duplication."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    nb32 = jnp.int32(nblocks)
    c = i // nb32
    b = jax.lax.rem(i, nb32)
    slot = jax.lax.rem(i, jnp.int32(2))
    nxt = jax.lax.rem(i + 1, jnp.int32(2))

    def start_planes(step, buf):
        cs = step // nb32
        bs = jax.lax.rem(step, nb32)
        for m in range(hr):
            pltpu.make_async_copy(
                q_hbm.at[cs, m, pl.ds(bs * TB, pad), :],
                scratch.at[buf, m], sem.at[buf, m]).start()

    @pl.when(i == 0)
    def _():
        start_planes(i, slot)

    @pl.when(i + 1 < nsteps)
    def _():
        start_planes(i + 1, nxt)

    for m in range(hr):
        pltpu.make_async_copy(
            q_hbm.at[c, m, pl.ds(b * TB, pad), :],
            scratch.at[slot, m], sem.at[slot, m]).wait()

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=prec)
    K = wp.shape[0]        # window planes (K > 1: multitaper — the
    #                        signal is read ONCE for all tapers)
    raw_planes = [scratch[slot, j1 % hr, j1 // hr: j1 // hr + TB, :]
                  for j1 in range(N1)]
    keep = None
    if accum and valid_last != TB:
        # frames past the true frame count in the last block must not
        # contribute to the PSD sum. Frames are SUBLANES and stay
        # sublane-independent through the window/stage-1/stage-2
        # pipeline (matmuls mix lanes only), so the mask applies as
        # one multiplier per k1 row at the reduce instead of a select
        # per input plane (N1 + iota ops on every grid step)
        fid = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 0)
        keep = jnp.where((b < nblocks - 1) | (fid < valid_last),
                         1.0, 0.0)

    def stage1(planes, k1):
        """First-stage DFT row k1 as tile adds; +-1 coefficients fold
        into adds/subs (most of W_N1 is 0/+-1/+-i)."""
        bre = None
        bim = None
        for j1 in range(N1):
            c1, s1 = float(w1re[k1, j1]), float(w1im[k1, j1])
            if abs(c1) > 1e-12:
                if abs(c1 - 1.0) < 1e-12:
                    bre = planes[j1] if bre is None else bre + planes[j1]
                elif abs(c1 + 1.0) < 1e-12:
                    bre = -planes[j1] if bre is None else bre - planes[j1]
                else:
                    t = planes[j1] * c1
                    bre = t if bre is None else bre + t
            if abs(s1) > 1e-12:
                if abs(s1 - 1.0) < 1e-12:
                    bim = planes[j1] if bim is None else bim + planes[j1]
                elif abs(s1 + 1.0) < 1e-12:
                    bim = -planes[j1] if bim is None else bim - planes[j1]
                else:
                    t = planes[j1] * s1
                    bim = t if bim is None else bim + t
        zero = lambda: jnp.zeros((TB, 128), jnp.float32)
        return (bre if bre is not None else zero(),
                bim if bim is not None else zero())

    # real input planes: B[N1-k1] = conj(B[k1]) — compute the first
    # stage only for k1 <= N1/2. The per-k1 twiddle is applied as an
    # elementwise complex multiply (VPU tile chains measured 17-21
    # TB/s effective on v5e — essentially free) so that EVERY k1 row
    # shares one stage-2 RHS [W2re | W2im] and the whole stage 2 runs
    # as ONE (2*rows*TB, 128) @ (128, 256) matmul per taper: the
    # round-3 kernel issued 2*rows small (TB,128)@(128,256) matmuls
    # per step and they, not the VPU ops, were the 34%-MXU plateau
    # (measured: the kernel runs at the matmul FLOP rate; an 18%
    # tile-op reduction moved nothing).
    acc = [None] * rows
    for k in range(K):
        planes = [raw_planes[j1] * wp[k, j1, :][None, :]
                  for j1 in range(N1)]
        fft_rows = (_stage1_fft(planes, N1)
                    if N1 & (N1 - 1) == 0 else None)
        cache = {}
        cre, cim = [], []
        for k1 in range(rows):
            mirrored = k1 > N1 // 2
            if not mirrored:
                if fft_rows is not None:
                    r, i = fft_rows[k1]
                    zero = lambda: jnp.zeros((TB, 128), jnp.float32)
                    bre = r if r is not None else zero()
                    bim = i if i is not None else zero()
                else:
                    bre, bim = stage1(planes, k1)
                cache[k1] = (bre, bim)
            else:
                # mirrored row: conjugate of the cached row (real
                # input); |.|^2 output makes the overall imag sign
                # irrelevant
                bre, bim = cache[N1 - k1]
            tre = twt[0, k1, :][None, :]
            tim = twt[1, k1, :][None, :]
            if mirrored:       # (bre - i*bim) * (tre + i*tim)
                cre.append(bre * tre + bim * tim)
                cim.append(bre * tim - bim * tre)
            else:              # (bre + i*bim) * (tre + i*tim)
                cre.append(bre * tre - bim * tim)
                cim.append(bre * tim + bim * tre)
        # Karatsuba complex multiply: 3 shared-RHS matmuls instead of
        # the 4 products of [CRE; CIM] @ [W2re | W2im] — stage-2 MXU
        # time is the kernel's dominant term
        CRE = jnp.concatenate(cre, axis=0)          # (rows*TB, 128)
        CIM = jnp.concatenate(cim, axis=0)
        P1 = dot(CRE, w2cat[:, :128])               # CRE @ W2re
        P2 = dot(CIM, w2cat[:, 128:256])            # CIM @ W2im
        P3 = dot(CRE + CIM, w2cat[:, 256:])         # (CRE+CIM)@(re+im)
        for k1 in range(rows):
            s = slice(k1 * TB, (k1 + 1) * TB)
            dre = P1[s] - P2[s]
            dim = P3[s] - P1[s] - P2[s]
            pw = dre * dre + dim * dim              # (TB, 128)
            acc[k1] = pw if acc[k1] is None else acc[k1] + pw

    for k1 in range(rows):
        pw = acc[k1]
        if accum:
            if keep is not None:
                pw = pw * keep
            row = jnp.sum(pw, axis=0, keepdims=True)    # (1, 128)

            @pl.when(b == 0)
            def _(row=row, k1=k1):
                o_ref[0, 0, k1, :] = row[0]

            @pl.when(b > 0)
            def _(row=row, k1=k1):
                o_ref[0, 0, k1, :] = o_ref[0, 0, k1, :] + row[0]
        else:
            o_ref[0, 0, k1] = pw


def stft_pow_pallas(x, win, nfft, hop, nframes, accumulate=False,
                    precision="highest", TB=256, onesided=False,
                    raw=False, interpret=False):
    """Fused windowed-segment power spectra on TPU.

    x: (n,) or (n, C) real f32 signal (time-major); win: (nfft,) HOST
    numpy window (design-time constant), (K, nfft) stacked windows
    (multitaper: the signal is read once, per-window |DFT|^2 summed
    in-kernel — fold any per-taper weight into the window as
    win_k/sqrt(r_k), reference multitaper.jl:237-240), or None; frames
    start at b*hop, b < nframes. Returns DFT bin powers in the
    four-step tile layout (see bins_from_tile):
      accumulate=False: (C, nframes, N1, 128) per-frame |X|^2 (summed
        over the K windows), or the raw 5-D block layout
        (C, nblocks, N1, TB, 128) when raw=True (caller collapses the
        block/frame reordering into its own final transpose instead of
        paying one here)
      accumulate=True:  (C, rows, 128) sum over frames (Welch
        numerator), rows = N1//2+1 when onesided (use
        onesided_bins_from_tile) else N1
    """
    N1 = nfft // 128
    if win is None:
        wp = np.ones((1, N1, 128))
    else:
        wa = np.asarray(win, np.float64)
        wp = wa.reshape((-1, N1, 128) if wa.ndim == 2 else (1, N1, 128))
    return _stft_pow_jit(x, jnp.asarray(wp.astype(np.float32)), nfft,
                         hop, nframes, accumulate, precision, TB,
                         bool(onesided and accumulate), raw, interpret)


@functools.partial(jax.jit, static_argnames=("nfft", "hop", "nframes",
                                             "accumulate", "precision",
                                             "TB", "onesided", "raw",
                                             "interpret"))
def _stft_pow_jit(x, wp, nfft, hop, nframes, accumulate,
                  precision, TB, onesided, raw, interpret):
    if x.ndim == 1:
        x = x[:, None]
    n, C = x.shape
    N1 = nfft // 128
    hr = hop // 128
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    nblocks = -(-nframes // TB)
    valid_last = nframes - (nblocks - 1) * TB
    extra = -(-N1 // hr)
    pad = -(-(TB + extra) // 8) * 8
    nrq = nblocks * TB + pad
    need = nrq * hr * 128
    # (C, hr, nrq, 128) interleaved row planes in ONE fused pallas
    # transpose+regroup pass (270 GB/s measured; the round-3 XLA
    # transpose + swapaxes prep cost ~5.5 ms of the 8.66 ms welch
    # bench pass, and a two-pallas-call composition re-inserted a
    # ~3.3 ms XLA layout copy between them)
    on_tpu = (not interpret
              and jax.devices()[0].platform not in ("cpu",))
    if on_tpu and n >= 1 << 16:
        from .transpose import regroup_planes_pallas
        q = regroup_planes_pallas(x, hr, nrq)
    else:
        xT = x.T
        if need > n:
            xT = jnp.pad(xT, ((0, 0), (0, need - n)))
        rows4 = xT[:, : nrq * hr * 128].reshape(C, nrq, hr, 128)
        q = jnp.swapaxes(rows4, 1, 2)             # (C, hr, nrq, 128)

    w1re, w1im, twre, twim, w2re, w2im, _ = _tables(nfft, N1, None)
    rows = N1 // 2 + 1 if onesided else N1
    # SHARED stage-2 RHS [W2re | W2im | W2re+W2im] for every k1 row —
    # the per-k1 twiddle is an in-kernel elementwise complex multiply
    # (VPU, ~free) so stage 2 is three big Karatsuba matmuls per taper
    w2cat = np.concatenate([w2re, w2im, w2re + w2im], axis=1)
    twt = np.stack([twre, twim])                       # (2, N1, 128)
    tab = [jnp.asarray(w2cat), jnp.asarray(twt), wp]
    if accumulate:
        out_shape = (C, 1, rows, 128)
        out_specs = pl.BlockSpec((1, 1, rows, 128),
                                 lambda i: (i // nblocks, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = (C, nblocks, N1, TB, 128)
        out_specs = pl.BlockSpec((1, 1, N1, TB, 128),
                                 lambda i: (i // nblocks, i % nblocks,
                                            0, 0, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, w1re=w1re, w1im=w1im, TB=TB, N1=N1,
                          rows=rows, hr=hr, pad=pad,
                          nblocks=nblocks, prec=prec, accum=accumulate,
                          valid_last=valid_last),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(C * nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((128, 384), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N1, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wp.shape[0], N1, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, hr, pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, hr)),
        ],
        interpret=interpret,
    )(q, *tab)
    if accumulate:
        return out[:, 0]
    if raw:
        return out
    # (C, nblocks, N1, TB, 128) -> (C, frames, N1, 128)
    out = jnp.swapaxes(out, 2, 3).reshape(C, nblocks * TB, N1, 128)
    return out[:, :nframes]


def onesided_bins_from_tile(tile, nfft, nbins):
    """Bin order for the rows = N1//2+1 one-sided accumulator tile:
    bin k is at (k1, k2) when k1 = k %% N1 <= N1/2, else at the mirror
    (N1-k1, 127-k2) (real-input symmetry |X[k]| = |X[nfft-k]|)."""
    N1 = nfft // 128
    rows = N1 // 2 + 1
    flat = tile.reshape(tile.shape[:-2] + (rows * 128,))
    k = np.arange(nbins)
    k1 = k % N1
    k2 = k // N1
    idx = np.where(k1 <= N1 // 2, k1 * 128 + k2,
                   (N1 - k1) * 128 + (127 - k2))
    return flat[..., jnp.asarray(idx)]


def bins_from_tile(tile, nfft, nbins):
    """Reorder the (..., N1, 128) four-step tile into DFT bin order
    k = 0..nbins-1. Bin k lives at (k1, k2) = (k % N1, k // N1), so the
    permutation is exactly the tile transpose: transposing to
    (..., 128, N1) and flattening gives index k2*N1 + k1 == k — a pure
    XLA transpose (bandwidth-speed), NOT a lane gather."""
    flat = jnp.swapaxes(tile, -2, -1).reshape(tile.shape[:-2] + (nfft,))
    return flat[..., :nbins]
