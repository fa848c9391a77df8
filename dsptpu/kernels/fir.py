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

Geometry (v3 — zero-copy wrapper, scratch history carry). The kernel
consumes the signal directly as (C, R0, 128) rows with NO front
padding: grid step p emits output rows [p*A, p*A + A) from ONE aligned
input block; all M+1 tap matrices multiply in ONE wide
(A, 128) @ (128, 128*(M+1)) matmul and the row shifts move AFTER the
matmul (pltpu.roll + where). The cross-block history is the PREVIOUS
step's product rows, carried in VMEM scratch across the sequential
grid — the v2 kernel re-fetched block p-1 as a second BlockSpec view
and issued M+1 narrow N=128 matmuls; v3 halves the signal reads and
runs the matmul at the wide-N rate (35 vs 25 TF/s measured at this K).
R0 need not be a multiple of A: Pallas drops out-of-bounds writes and
the kernel is causal in both rows and lanes (C_0 is
lane-lower-triangular; C_m for m > 0 read only PAST rows), so garbage
in the ragged tail block only reaches discarded outputs (the scratch
carry out of a ragged tail is consumed only by the next channel's
first block, which zero-masks it).

Why this structure: the kernel runs at 74-76 GS/s on v5e (127 taps,
HIGHEST, 38-39 TF/s issued — at the measured Mosaic f32 matmul peak),
while every XLA relayout of a 40 MB 1-D signal
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


def _kernel(v1, g, o_ref, pprev, *, M, A, prec):
    """v1: block p (the step's own A rows); pprev: VMEM scratch
    carrying the PREVIOUS step's shifted-tap products across the
    sequential grid (the history that used to need a second fetch of
    block p-1 — dropping it halves the kernel's signal reads)."""
    b = pl.program_id(1)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=prec)
    # Y[r] = sum_m X[r - m] @ C_m, computed as ONE wide matmul
    # P = X @ [C0 | C1 | ... | CM] followed by post-matmul row shifts:
    # Y[r] = sum_m P[r - m, m-block]. The round-3 form issued M+1
    # separate N=128 matmuls; merging the RHS lifts the matmul rate
    # (N >= 256 amortizes MXU weight loads; measured 35 vs 25 TF/s at
    # this K). Rows r < m take the previous block's P values from the
    # scratch carry, substituted after a pltpu.roll — Mosaic lowers
    # roll+where but not sublane-shifted concatenation; zero state at
    # the first block of each channel.
    P = dot(v1[0], g[:, :])                      # (A, 128*(M+1))
    acc = P[:, :128]
    if M:
        rid = jax.lax.broadcasted_iota(jnp.int32, (A, 128), 0)
        for m in range(1, M + 1):
            Pm = P[:, 128 * m:128 * (m + 1)]
            y = pltpu.roll(Pm, m, axis=0)        # row r <- P[r-m]
            prev = pltpu.roll(pprev[:, 128 * (m - 1):128 * m], m,
                              axis=0)            # row r <- prev[A-m+r]
            fill = jnp.where(b > 0, prev, jnp.zeros_like(prev))
            acc = acc + jnp.where(rid < m, fill, y)
        pprev[:, :] = P[:, 128:]
    o_ref[0] = acc


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
            pl.BlockSpec((128, ncols), lambda c_, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, 128), lambda c_, p: (c_, p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((A, max(128 * M, 128)), jnp.float32)],
        interpret=interpret,
    )(xr, g)


def fir_pallas(x, b, A=2048, interpret=False, precision="highest"):
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
