"""Pallas TPU kernel for block-polyphase FIR filtering.

The streaming engine lowers every non-arbitrary kernel (single-rate,
interpolation, decimation, rational resampling) to the block-matmul
contract y[b] = frames[b] @ G, where frame b is the input window
xcat[s0 + b*M : s0 + b*M + W] and G is a small banded (W, L) tap
matrix (see stream_filt._block_matmul, the XLA path; reference
semantics stream_filt.jl:476-515).

The XLA path materializes the (B, W) frame matrix in HBM (~W/M x input
read + write + re-read). This Pallas kernel keeps the framing in VMEM:
each program DMAs one contiguous input chunk of TB*M + pad samples
(consecutive chunks overlap by the frame tail, which standard
BlockSpec tiling cannot express), forms its TB overlapping frames by
shifted strided reshapes *in VMEM*, and multiplies the resident G on
the MXU. HBM traffic drops to ~1x input + output.
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

__all__ = ["pfb_block_filt_pallas", "pallas_available"]


def _kernel(x_hbm, g_ref, o_ref, scratch, sem, *, TB, Mp, L, q, qp,
            nrows):
    # x_hbm: (C * n/M, Mp) lane-padded row-blocked input (2-D: only
    # the leading dim is dynamically sliced, the best-supported DMA
    # pattern); scratch: (TB + qp, Mp), qp = q+1 rounded to sublanes
    c = pl.program_id(0)
    b = pl.program_id(1)
    row0 = c * nrows + b * TB
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(row0, TB + qp), :], scratch, sem)
    dma.start()
    dma.wait()
    # frames[:, j*M:(j+1)*M] == rows[j:TB+j], so the frame matmul
    # decomposes into q+1 shifted (TB, Mp) @ (Mp, L) products (Mosaic
    # cannot concatenate sublane-shifted slices, but can multiply
    # them); the lane-pad columns multiply zero rows of G
    acc = jnp.zeros((TB, L), o_ref.dtype)
    for j in range(q + 1):
        acc = acc + jnp.dot(scratch[j: TB + j, :],
                            g_ref[j * Mp:(j + 1) * Mp, :],
                            preferred_element_type=o_ref.dtype,
                            precision=jax.lax.Precision.HIGHEST)
    o_ref[0, 0] = acc


@functools.partial(jax.jit,
                   static_argnames=("s0", "B", "M", "W", "TB", "interpret"))
def pfb_block_filt_pallas(xcat, G, s0, B, M, W, TB=256, interpret=False):
    """Block-polyphase filtering on TPU via Pallas.

    xcat: (n,) or (C, n) channels-leading input (history prepended);
    G: (W, L) tap matrix; frame b covers xcat[..., s0+b*M : s0+b*M+W].
    Returns (C, B*L) block outputs (caller trims to out_len).
    """
    squeeze = xcat.ndim == 1
    if squeeze:
        xcat = xcat[None]
    C, n = xcat.shape
    L = G.shape[1]
    q = -(-(W - M) // M) if W > M else 0
    qp = -(-(q + 1) // 8) * 8  # sublane-aligned chunk tail

    nb_tiles = -(-B // TB)
    # shift off s0, pad so the last chunk's (TB + qp) M-rows exist
    need = s0 + (nb_tiles * TB + qp) * M
    if need > n:
        xcat = jnp.pad(xcat, ((0, 0), (0, need - n)))
    if s0:
        xcat = xcat[:, s0:]
    nrows = xcat.shape[1] // M
    Mp = -(-M // 128) * 128  # lane-aligned row width
    xr = xcat[:, : nrows * M].reshape(C * nrows, M)
    if Mp != M:
        xr = jnp.pad(xr, ((0, 0), (0, Mp - M)))
    # per-segment tap blocks, each padded to Mp rows
    Gh = jnp.zeros(((q + 1) * M, L), xcat.dtype).at[:W].set(
        G.astype(xcat.dtype))
    Gp = jnp.pad(Gh.reshape(q + 1, M, L), ((0, 0), (0, Mp - M), (0, 0)))
    Gp = Gp.reshape((q + 1) * Mp, L)

    out = pl.pallas_call(
        functools.partial(_kernel, TB=TB, Mp=Mp, L=L, q=q, qp=qp,
                          nrows=nrows),
        out_shape=jax.ShapeDtypeStruct((C, nb_tiles, TB, L), xcat.dtype),
        grid=(C, nb_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(((q + 1) * Mp, L), lambda c, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TB, L), lambda c, b: (c, b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TB + qp, Mp), xcat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xr, Gp)
    out = out.reshape(C, nb_tiles * TB * L)[:, : B * L]
    return out[0] if squeeze else out
