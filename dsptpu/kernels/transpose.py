"""Pallas TPU kernel: blocked 2-D transpose.

XLA's transpose of a large f32 matrix measured ~25% of HBM bandwidth
on v5e (0.4 ms per 40 MB each way — the lane<->sublane shuffle lowers
conservatively). This kernel tiles the transpose into (TT, TT) VMEM
blocks — read block (i, j), swap in-VMEM (the XLU handles 2-D tile
transposes), write block (j, i) — so both streams are sequential at
tile granularity and the shuffle never touches HBM.

Used for the big layout changes around the spectral kernels (e.g. the
spectrogram epilogue permute); plain jnp.swapaxes stays the default
until the device measurement says otherwise (DSPTPU_PALLAS gates the
callers, not this module).
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

__all__ = ["transpose2d_pallas", "pallas_available"]


def _kern(x_ref, o_ref):
    o_ref[...] = jnp.swapaxes(x_ref[...], 0, 1)


@functools.partial(jax.jit, static_argnames=("TT", "interpret"))
def _t2d_jit(x, TT, interpret):
    M, N = x.shape
    return pl.pallas_call(
        _kern,
        out_shape=jax.ShapeDtypeStruct((N, M), x.dtype),
        grid=(M // TT, N // TT),
        in_specs=[pl.BlockSpec((TT, TT), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TT, TT), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def transpose2d_pallas(x, TT=512, interpret=False):
    """Transpose a 2-D f32 array via (TT, TT) VMEM tiles. Ragged edges
    are padded in (one cheap pad) and sliced out (the slice of the
    transposed array is leading-dim, i.e. free-ish)."""
    x = jnp.asarray(x)
    M, N = x.shape
    Mp, Np = -(-M // TT) * TT, -(-N // TT) * TT
    if (Mp, Np) != (M, N):
        x = jnp.pad(x, ((0, Mp - M), (0, Np - N)))
    y = _t2d_jit(x, TT, interpret)
    return y[:N, :M]


def _kern_tall(x_ref, o_ref, *, TR, M):
    i = pl.program_id(0)
    t = jnp.swapaxes(x_ref[...], 0, 1)
    # zero anything at/after the true input length: tiles fully past
    # the input re-read a clamped block (garbage), and the boundary
    # tile has a ragged tail — downstream |.|^2 would turn leftover
    # inf/NaN into poison even under a 0-mask
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    o_ref[...] = jnp.where(i * TR + col < M, t, 0.0)


@functools.partial(jax.jit, static_argnames=("TR", "out_len",
                                             "interpret"))
def _ttall_jit(x, TR, out_len, interpret):
    M, N = x.shape
    in_tiles = -(-M // TR)
    return pl.pallas_call(
        functools.partial(_kern_tall, TR=TR, M=M),
        out_shape=jax.ShapeDtypeStruct((N, out_len), x.dtype),
        grid=(out_len // TR,),
        in_specs=[pl.BlockSpec(
            (TR, N), lambda i: (jnp.minimum(i, in_tiles - 1), 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, TR), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _kern_regroup(x_ref, o_ref, *, TRq, hr, C, M):
    i = pl.program_id(0)
    t = x_ref[...]                            # (TRq*hr*128, C)
    t4 = t.reshape(TRq, hr, 128, C)           # leading sublane split
    out = jnp.transpose(t4, (3, 1, 0, 2))     # (C, hr, TRq, 128)
    # zero rows at/after the true signal length: the last block reads
    # OOB (garbage) and downstream |.|^2 would amplify inf/NaN
    q_i = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
    l_i = jax.lax.broadcasted_iota(jnp.int32, out.shape, 3)
    m_i = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    tpos = ((i * TRq + q_i) * hr + m_i) * 128 + l_i
    o_ref[...] = jnp.where(tpos < M, out, 0.0)


@functools.partial(jax.jit, static_argnames=("hr", "nrq", "TRq",
                                             "interpret"))
def _regroup_jit(x, hr, nrq, TRq, interpret):
    M, C = x.shape
    blk = TRq * hr * 128
    # the grid covers nrq (the padded frame budget), which can run
    # past the signal: clamp fully-OOB block indices to the ragged
    # boundary block (values are zero-masked by tpos < M in the
    # kernel; slightly-OOB reads of the boundary block are tolerated,
    # an unclamped deep-OOB block read faults at run time)
    in_tiles = -(-M // blk)
    return pl.pallas_call(
        functools.partial(_kern_regroup, TRq=TRq, hr=hr, C=C, M=M),
        out_shape=jax.ShapeDtypeStruct((C, hr, nrq, 128), jnp.float32),
        grid=(nrq // TRq,),
        in_specs=[pl.BlockSpec(
            (blk, C), lambda i: (jnp.minimum(i, in_tiles - 1), 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, hr, TRq, 128),
                               lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def regroup_planes_pallas(x, hr, nrq, TRq=16, interpret=False):
    """(n, C) channel-minor signal -> (C, hr, nrq, 128) interleaved
    row planes q[c, m, r, :] = x[(r*hr + m)*128 : ..., c], zero-filled
    past n — the exact layout the fused STFT kernel DMAs, produced in
    ONE pallas pass (measured 270 GB/s on v5e). The XLA transpose +
    swapaxes regroup this replaces cost ~5.5 ms of the 8.66 ms round-3
    welch pass at the bench shape, and composing two pallas calls with
    a lane-crossing reshape between them re-inserted a ~3.3 ms XLA
    layout copy."""
    x = jnp.asarray(x)
    while nrq % TRq:
        TRq //= 2
    return _regroup_jit(x, hr, nrq, max(TRq, 1), interpret)


def transpose_tall_pallas(x, TR=8192, pad_to=None, interpret=False):
    """(M, C) -> (C, out_len) for tall-skinny matrices (C up to a
    couple of hundred lanes): one grid pass of (TR, C) tiles transposed
    in-VMEM. Measured 215 GB/s on v5e for (1M, 64) f32 vs ~90 GB/s for
    XLA's transpose of the same array (the channel-major -> time-major
    relayout was over half of the round-3 welch wall time). The output
    time axis is zero-padded IN-KERNEL to out_len = ceil(max(M,
    pad_to)/TR)*TR — an XLA pad afterwards would re-copy everything."""
    x = jnp.asarray(x)
    M, N = x.shape
    out_len = -(-max(M, pad_to or 0) // TR) * TR
    return _ttall_jit(x, TR, out_len, interpret)


def _kern_spectro(x_ref, o_ref, *, l2):
    t = x_ref[:, 0, 0, :, :]                 # (C, TF, 128)
    # 3-step adjacent swaps: Mosaic rejects the direct (2,1,0) permute
    # but lowers each pairwise swap (device-probed, 0.07 ms/tile)
    s = jnp.swapaxes(jnp.swapaxes(jnp.swapaxes(t, 0, 1), 1, 2), 0, 1)
    o_ref[:, 0, :, :] = s[:l2]               # (l2, TF, C)


@functools.partial(jax.jit, static_argnames=("l2", "interpret"))
def _spectro_permute_jit(tile, l2, interpret):
    C, nb, N1, TB, _ = tile.shape
    # frame sub-tiles keep the in+out blocks inside VMEM (the whole
    # (C,1,1,TB,128) block at C=64, TB=256 is 8 MB before buffering)
    TF = TB
    while C * TF * 128 * 4 > (2 << 20) and TF % 2 == 0 and TF > 8:
        TF //= 2
    nf = TB // TF
    return pl.pallas_call(
        functools.partial(_kern_spectro, l2=l2),
        out_shape=jax.ShapeDtypeStruct((l2, N1, nb * TB, C),
                                       jnp.float32),
        grid=(nb, N1, nf),
        in_specs=[pl.BlockSpec((C, 1, 1, TF, 128),
                               lambda b, k1, f: (0, b, k1, f, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((l2, 1, TF, C),
                               lambda b, k1, f: (0, k1, b * nf + f, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tile)


def spectro_permute_pallas(tile, l2, interpret=False):
    """(C, nb, N1, TB, 128) raw STFT power blocks -> (l2, N1, nb*TB, C)
    whose (l2, N1) flatten is DFT-bin order k = k1 + N1*k2 (k2 < l2)
    and whose frame axis is nb*TB. Built to replace the XLA 5-D
    transpose epilogue of the spectrogram path (4.2 ms of the 10.5 ms
    bench spectrogram, ~90 GB/s) — measured NEGATIVE result: at
    VMEM-fitting frame sub-tiles (TF=64, C=64) the kernel matches XLA
    (11.1 vs 10.6 ms end to end; a whole-TB tile hits 230 GB/s but
    needs 24+ MB of blocks), so the XLA epilogue stays the default and
    this kernel is kept as measured machinery for smaller channel
    counts."""
    return _spectro_permute_jit(tile, int(l2), interpret)
