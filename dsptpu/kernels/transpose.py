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
