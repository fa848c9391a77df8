"""Pallas TPU kernel: fused Levinson-Durbin recursion.

The order recursion (reference lpc.jl:122-145) is sequential in the
model order m but every per-order update is an elementwise op over the
channel batch. The XLA form (ops/lpc.levinson) emits ~5 HLOs per order
on tiny (p, C) arrays, so at p = 16 the whole solve is ~75 dispatch-
bound kernels (measured ~3 ms on a tunneled v5e for C = 2500 — pure
overhead, the arithmetic is microseconds). This kernel runs the entire
recursion in one pallas_call with the state held in registers/VMEM.

Flip-free formulation: Mosaic has no sublane reverse, so alongside the
coefficient rows a[i] the kernel carries the reversed copy
ar[i] = a[m-1-i]. Both advance with elementwise FMAs plus one sublane
roll per order:

    acc  = R[m] + sum(R[1:m] * ar[:m-1])          (aligned rows)
    k    = -acc / err
    a'   = a + k*ar,  a'[m-1] = k
    ar'  = roll(ar + k*a, 1),  ar'[0] = k
    err *= 1 - k^2

Channels ride the 128-wide lanes; the grid tiles the channel axis, and
each grid step is independent (no carry).
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

__all__ = ["levinson_pallas", "lev_supported", "pallas_available"]

_BC = 2048  # channel block (lanes) per grid step


def lev_supported(p, C, dtype):
    """Kernel applies to real f32 batches with enough channels to fill
    lanes; p is unrolled so keep it moderate."""
    return (pallas_available and 2 <= p <= 64 and C >= 128
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32))


def _kernel(r_ref, a_ref, err_ref, refl_ref, *, p):
    R = r_ref[...]                                   # (p+1, BC)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (p, R.shape[1]), 0)
    k = -R[1:2] / R[0:1]                             # (1, BC)
    err = R[0:1] * (1.0 - k * k)
    a = jnp.where(rowi == 0, k, 0.0)
    ar = a                                           # ar_1[0] = a_1[0]
    refl = a
    for m in range(2, p + 1):
        acc = R[m:m + 1] + jnp.sum(R[1:m] * ar[:m - 1], axis=0,
                                   keepdims=True)
        k = -acc / err
        anew = jnp.where(rowi == m - 1, k, a + k * ar)
        ars = ar + k * a
        ar = jnp.where(rowi == 0, k, pltpu.roll(ars, 1, 0))
        a = anew
        refl = jnp.where(rowi == m - 1, k, refl)
        err = err * (1.0 - k * k)
    a_ref[...] = a
    err_ref[...] = err
    refl_ref[...] = refl


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def levinson_pallas(R, p, interpret=False, bc=_BC):
    """R: (p+1, C) real f32 autocorrelation lags (lag 0 first).
    Returns (a, pred_err, refl) with a, refl shaped (p, C) and
    pred_err (C,), matching ops/lpc.levinson."""
    pp1, C = R.shape
    p = int(p)
    assert pp1 >= p + 1
    Cp = -(-C // bc) * bc
    Rp = jnp.pad(R[:p + 1], ((0, 0), (0, Cp - C)))
    # guard the padded lanes: R[0] enters as a divisor
    Rp = Rp.at[0, C:].set(1.0) if Cp > C else Rp
    grid = (Cp // bc,)
    kern = functools.partial(_kernel, p=p)
    a, err, refl = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((p + 1, bc), lambda c: (0, c))],
        out_specs=[pl.BlockSpec((p, bc), lambda c: (0, c)),
                   pl.BlockSpec((1, bc), lambda c: (0, c)),
                   pl.BlockSpec((p, bc), lambda c: (0, c))],
        out_shape=[jax.ShapeDtypeStruct((p, Cp), R.dtype),
                   jax.ShapeDtypeStruct((1, Cp), R.dtype),
                   jax.ShapeDtypeStruct((p, Cp), R.dtype)],
        interpret=interpret,
    )(Rp)
    return a[:, :C], err[0, :C], refl[:, :C]
