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

Geometry (v2 — zero-copy wrapper). The kernel consumes the signal
directly as (C, R0, 128) rows with NO front padding: grid step p emits
output rows [p*A, p*A + A) from TWO BlockSpec views of the input — the
aligned block p (rows r-d >= 0 of the step, "main") and block
max(p-1, 0) whose LAST d rows supply the tap history crossing the
block edge ("head", masked to the zero-state at p == 0). Mosaic
rejects sublane-shifted concatenation, so each C_m contributes two
partial matmuls with sublane-offset reads (supported). R0 need not be
a multiple of A: Pallas drops out-of-bounds writes and the kernel is
causal in both rows and lanes (C_0 is lane-lower-triangular; C_m for
m > 0 read only PAST rows), so garbage in the ragged tail block only
reaches discarded outputs.

Why this structure: the kernel itself runs at ~50 GS/s on v5e (127
taps, HIGHEST), while every XLA relayout of a 40 MB 1-D signal
((n,)->(1,n) newaxis, pad, slice, transpose) costs 0.4-1.8 ms — the
v1 front-padded wrapper spent ~4/5 of its time in glue. The only
unavoidable cost left is one (n,)->(R0,128) relayout on input (~0.2 ms
per 40 MB); the output reshape back to 1-D is free.
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


def _kernel(v1, v0, g, o_ref, *, M, A, prec):
    """v1: block p (the step's own A rows); v0: block max(p-1, 0),
    whose last rows carry the cross-block tap history."""
    b = pl.program_id(1)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=prec)
    # Y[r] = sum_m X[r - m] @ C_m. m = 0 is one full aligned matmul
    # initializing every output row; m >= 1 rows r < m take their
    # history from the tail of block p-1 (zero state at p == 0, where
    # skipping the head IS the zero-history because m=0 already wrote
    # all rows).
    o_ref[0] = dot(v1[0], g[:, :128])
    for m in range(1, M + 1):
        Cm = g[:, 128 * m:128 * (m + 1)]
        main = dot(v1[0, : A - m, :], Cm)          # -> out rows [m, A)
        o_ref[0, m:A, :] = o_ref[0, m:A, :] + main

        @pl.when(b > 0)
        def _(m=m, Cm=Cm):
            head = dot(v0[0, A - m:A, :], Cm)      # -> out rows [0, m)
            o_ref[0, :m, :] = o_ref[0, :m, :] + head


@functools.partial(jax.jit,
                   static_argnames=("nb", "A", "interpret", "precision"))
def _fir_jit(xr, b, nb, A, interpret, precision="highest"):
    """xr: (C, R0, 128) f32 signal rows. Returns (C, R0, 128) f32."""
    C, R0, _ = xr.shape
    M = _mcount(nb) - 1
    steps = -(-R0 // A)
    ncols = 128 * (M + 1)
    c = jnp.concatenate([b.astype(jnp.float32),
                         jnp.zeros((ncols + 1 - nb,), jnp.float32)])
    g = jnp.tile(c, 128)[:128 * ncols].reshape(128, ncols)

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    return pl.pallas_call(
        functools.partial(_kernel, M=M, A=A, prec=prec),
        out_shape=jax.ShapeDtypeStruct((C, R0, 128), jnp.float32),
        grid=(C, steps),
        in_specs=[
            pl.BlockSpec((1, A, 128), lambda c_, p: (c_, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, 128),
                         lambda c_, p: (c_, jnp.maximum(p - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, ncols), lambda c_, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, 128), lambda c_, p: (c_, p, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, xr, g)


def fir_pallas(x, b, A=1024, interpret=False, precision="highest"):
    """Fused causal FIR: x (n,) or (n, C) real f32, b (nb,) real f32
    taps. Returns filt(b, x) (zero initial state). Caller checks
    fir_supported(len(b), f32).

    Pass the 1-D form when the signal is 1-D: the (n, 1) column shape
    costs an extra relayout on TPU."""
    x = jnp.asarray(x).astype(jnp.float32)
    b = jnp.asarray(b)
    nb = int(b.shape[0])
    vec = x.ndim == 1
    squeeze = (not vec) and x.shape[1] == 1
    if squeeze:
        x = x.reshape(x.shape[0])
        vec = True
    n = x.shape[0]
    R0 = -(-n // 128)
    npad = R0 * 128 - n
    if vec:
        if npad:
            x = jnp.pad(x, (0, npad))
        xr = x.reshape(1, R0, 128)
        C = 1
    else:
        C = x.shape[1]
        xT = x.T                                       # (C, n)
        if npad:
            xT = jnp.pad(xT, ((0, 0), (0, npad)))
        xr = xT.reshape(C, R0, 128)
    A = max(8, min(int(A), -(-R0 // 8) * 8))       # clamp to the row count
    out = _fir_jit(xr, b, nb, A, bool(interpret), precision)
    y = out.reshape(C, R0 * 128)[:, :n]
    if squeeze:
        return y.reshape(n, 1)
    return y.reshape(n) if vec else y.T
