"""Pallas TPU kernel: fused causal FIR via lane-mixing row shifts.

The XLA block-Toeplitz path (ops/dspbase._fir_block_toeplitz) computes
a causal FIR as (B, W) frames @ (W, T) banded taps — 2*(T+nb-1) FLOPs
per sample, with the (B, W) frame matrix materialized in HBM by XLA
(measured v5e, 127 taps x 10M samples: 2.6 ms where the matmul work is
~0.4 ms). This kernel removes both costs. View the signal lane-major
as rows X[r, l] = x[r*128 + l]; then for tap index k = 128*m + (l-l'),

    Y[r, :] = sum_m X[r - m, :] @ C_m,   C_m[l', l] = b[128*m + l - l']

— M+1 = ceil((nb+127)/128) lane-mixing 128x128 matmuls per output
row-block, i.e. ~2*(nb+127) FLOPs/sample with NO frame materialization:
each input sample crosses HBM ~1.2x. The C_m are 128-column slices of
one wide banded-Toeplitz table built gather-free by the periodic
tile+reshape trick (dspbase.jl:26-105 semantics: causal filt with zero
initial state).

Geometry. Signal front-padded by M rows of zeros (covers the tap
history, nb - 1 <= 128*M + 127). Grid step p emits output rows
[p*A, p*A + A) and reads padded rows [p*A, p*A + A + M) delivered as
TWO BlockSpec views of the same array at block indices p and p+1
(Mosaic rejects sublane-shifted concatenation; contributions whose
row range crosses the block edge split into two partial matmuls with
sublane-offset reads, which Mosaic supports).
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

__all__ = ["fir_pallas", "fir_supported", "pallas_available"]


def _mcount(nb):
    """Number of lane-mixing matrices: k = 128*m + (l - l'),
    l - l' in (-128, 128), so m spans 0 .. floor((nb+126)/128)."""
    return (nb + 126) // 128 + 1


def fir_supported(nb, dtype):
    """Real f32 taps of moderate length; beyond ~1.5k taps the fused
    overlap-save FFT kernel (kernels/osconv.py) does less work."""
    if not pallas_available:
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    return 2 <= nb <= 1536


def _kernel(x1, x2, g, o_ref, *, M, A, prec):
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=prec)
    for m in range(M + 1):
        d = M - m
        Cm = g[:, 128 * m:128 * (m + 1)]
        top = dot(x1[0, d:A, :], Cm)               # out rows [0, A-d)
        if m == 0:
            o_ref[0, :A - d, :] = top
        else:
            o_ref[0, :A - d, :] = o_ref[0, :A - d, :] + top
        if d > 0:
            bot = dot(x2[0, :d, :], Cm)            # out rows [A-d, A)
            if m == 0:
                o_ref[0, A - d:, :] = bot
            else:
                o_ref[0, A - d:, :] = o_ref[0, A - d:, :] + bot


@functools.partial(jax.jit,
                   static_argnames=("nb", "A", "interpret"))
def _fir_jit(x, b, nb, A, interpret):
    """x: (n, C) real f32. Returns causal filt output (n, C) f32."""
    n, C = x.shape
    M = _mcount(nb) - 1
    steps = -(-(-(-n // 128)) // A)
    R = steps * A + A                              # + view-2 overshoot
    xt = x.T                                       # (C, n)
    xt = jnp.pad(xt, ((0, 0), (M * 128, R * 128 - n - M * 128)))
    xr = xt.reshape(C, R, 128)      # XP[g + M] rows hold out row g
    ncols = 128 * (M + 1)
    c = jnp.concatenate([b.astype(jnp.float32),
                         jnp.zeros((ncols + 1 - nb,), jnp.float32)])
    g = jnp.tile(c, 128)[:128 * ncols].reshape(128, ncols)

    grid = (C, steps)
    out = pl.pallas_call(
        functools.partial(_kernel, M=M, A=A,
                          prec=jax.lax.Precision.HIGHEST),
        out_shape=jax.ShapeDtypeStruct((C, steps * A, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, A, 128), lambda c_, p: (c_, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, 128), lambda c_, p: (c_, p + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, ncols), lambda c_, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, 128), lambda c_, p: (c_, p, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, xr, g)
    y = out.reshape(C, steps * A * 128)[:, :n]
    return y.T


def fir_pallas(x, b, A=1024, interpret=False):
    """Fused causal FIR: x (n,) or (n, C) real f32, b (nb,) real f32
    taps. Returns filt(b, x) (zero initial state). Caller checks
    fir_supported(len(b), f32)."""
    x = jnp.asarray(x)
    b = jnp.asarray(b)
    vec = x.ndim == 1
    x2 = x[:, None] if vec else x
    nb = int(b.shape[0])
    y = _fir_jit(x2.astype(jnp.float32), b, nb, int(A), bool(interpret))
    return y[:, 0] if vec else y
