"""Linear predictive coding: Burg and Levinson-Durbin estimation.

Capability parity with reference src/lpc.jl (lpc :26-32,94-98,159,
arburg :53-92, levinson :122-145). TPU-first shape: the recursions are
sequential over the (small, static) model order p, but every
per-order update is a whole-signal vector op, so the device code is a
Python loop over p emitting batched jnp ops — channels on trailing
dims ride the VPU lanes (a superset of the reference's vector-only
API).
"""

import os as _os

import numpy as np
import jax
import jax.numpy as jnp

from .dspbase import xcorr

__all__ = ["lpc", "arburg", "levinson", "LPCBurg", "LPCLevinson"]

# the order recursion is dispatch-bound on accelerators (~75 tiny HLOs
# at p=16); kernels/levinson.py fuses it into one pallas_call. Same
# switches as the other kernels: DSPTPU_NO_PALLAS=1 kills,
# DSPTPU_PALLAS=1 forces (interpret mode off-TPU).
_PALLAS_LEV = {"0": False, "1": True}.get(
    _os.environ.get("DSPTPU_PALLAS", ""), None)
if _os.environ.get("DSPTPU_NO_PALLAS", "") == "1":
    _PALLAS_LEV = False


def _pallas_lev_ok(p, C, dtype):
    if _PALLAS_LEV is False:
        return False
    from ..kernels.levinson import lev_supported
    if not lev_supported(p, C, dtype):
        return False
    if _PALLAS_LEV is True:
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


class LPCBurg:
    """Method marker (reference lpc.jl:11); lpc(..., LPCBurg())."""


class LPCLevinson:
    """Method marker (reference lpc.jl:12); lpc(..., LPCLevinson())."""


def arburg(x, p):
    """Burg-method LPC (reference lpc.jl:53-92, Vos fast recursion).
    x: (n,) or (n, *chans). Returns (a, prediction_err,
    reflection_coeffs) with a[0] = 1, a shaped (p+1, *chans)."""
    x = jnp.asarray(x)
    vec = x.ndim == 1
    xf = x[:, None] if vec else x.reshape(x.shape[0], -1)
    n, C = xf.shape
    if p >= n:
        raise ValueError("model order must be less than the signal length")
    cplx = jnp.issubdtype(xf.dtype, jnp.complexfloating)
    dtype = xf.dtype if (cplx or jnp.issubdtype(xf.dtype, jnp.floating)) \
        else jnp.float64

    unnormed = jnp.abs(jnp.sum(jnp.conj(xf) * xf, axis=0))  # (C,)
    pred_err = unnormed / n
    ef = xf.astype(dtype)
    eb = xf.astype(dtype)
    # coefficient rows in one (p+1, C) array; per-order update is a
    # flip + fused multiply-add over the filled slice (see levinson)
    a_arr = jnp.zeros((p + 1, C), dtype).at[0].set(1)
    refl = []
    den = 2 * unnormed
    ratio = jnp.ones_like(unnormed)

    for m in range(1, p + 1):
        cf = ef[-1]
        cb = eb[0]
        ef = ef[:-1]
        eb = eb[1:]
        den = ratio * den - (jnp.abs(cf) ** 2 + jnp.abs(cb) ** 2)
        k = -2 * jnp.sum(jnp.conj(eb) * ef, axis=0) / den
        refl.append(k)
        # a[i] += k * conj(a[m-i]) for i = 1..m
        a_arr = a_arr.at[1:m + 1].set(
            a_arr[1:m + 1] + k * jnp.conj(jnp.flip(a_arr[:m], 0)))
        ef_new = ef + k * eb
        eb = eb + jnp.conj(k) * ef
        ef = ef_new
        ratio = 1 - jnp.abs(k) ** 2
        pred_err = pred_err * ratio

    a_arr = jnp.conj(a_arr)                             # (p+1, C)
    refl_arr = jnp.stack(refl)
    if vec:
        return a_arr[:, 0], pred_err[0], refl_arr[:, 0]
    shape = x.shape[1:]
    return (a_arr.reshape((p + 1,) + shape), pred_err.reshape(shape),
            refl_arr.reshape((p,) + shape))


def levinson(R, p):
    """Levinson-Durbin recursion on an autocorrelation sequence
    (reference lpc.jl:122-145). R: (>= p+1,) or (m, *chans). Returns
    (a, prediction_err, reflection_coeffs), a shaped (p, *chans)."""
    R = jnp.asarray(R)
    vec = R.ndim == 1
    Rf = R[:, None] if vec else R.reshape(R.shape[0], -1)
    C = Rf.shape[1]
    if Rf.shape[0] < p + 1:
        raise ValueError("need at least p+1 autocorrelation lags")
    cplx = jnp.issubdtype(Rf.dtype, jnp.complexfloating)
    dtype = Rf.dtype if (cplx or jnp.issubdtype(Rf.dtype, jnp.floating)) \
        else jnp.float64
    Rf = Rf.astype(dtype)

    if not cplx and _pallas_lev_ok(p, C, dtype):
        from ..kernels.levinson import levinson_pallas
        try:
            interp = jax.devices()[0].platform in ("cpu",)
        except Exception:
            interp = True
        a_arr, pred_err, refl_arr = levinson_pallas(Rf[:p + 1], p,
                                                    interp)
        if vec:
            return a_arr[:, 0], pred_err[0], refl_arr[:, 0]
        shape = R.shape[1:]
        return (a_arr.reshape((p,) + shape), pred_err.reshape(shape),
                refl_arr.reshape((p,) + shape))

    k = -Rf[1] / Rf[0]
    pred_err = jnp.real(Rf[0]) * (1 - jnp.abs(k) ** 2)
    # coefficients live in one (p, C) array: each order update is a
    # whole-slice vector op (flip + fused multiply-add) instead of the
    # reference's per-coefficient scalar loop (lpc.jl:122-145) — the
    # recursion stays sequential in m but each step is 5 fused VPU ops
    a_arr = jnp.zeros((p, C), dtype).at[0].set(k)
    refl = [k]
    for m in range(2, p + 1):
        # dotu (unconjugated, reference lpc.jl:148-156):
        # acc = R[m] + sum_{i=1..m-1} R[i] * a[m-1-i]
        acc = Rf[m] + jnp.sum(Rf[1:m] * jnp.flip(a_arr[:m - 1], 0),
                              axis=0)
        k = -acc / pred_err
        head = a_arr[:m - 1]
        a_arr = a_arr.at[:m - 1].set(
            head + k * jnp.conj(jnp.flip(head, 0)))
        a_arr = a_arr.at[m - 1].set(k)
        refl.append(k)
        pred_err = pred_err * (1 - jnp.abs(k) ** 2)

    refl_arr = jnp.stack(refl)
    if vec:
        return a_arr[:, 0], pred_err[0], refl_arr[:, 0]
    shape = R.shape[1:]
    return (a_arr.reshape((p,) + shape), pred_err.reshape(shape),
            refl_arr.reshape((p,) + shape))


def lpc(x, p, method="burg"):
    """LPC coefficients and prediction error (reference lpc.jl:26-32,
    94-98). Omits the implicit leading 1 (like the reference).
    method in {"burg", "levinson"}."""
    x = jnp.asarray(x)
    if isinstance(method, LPCBurg) or method is LPCBurg:
        method = "burg"
    elif isinstance(method, LPCLevinson) or method is LPCLevinson:
        method = "levinson"
    if method == "burg":
        a, err, _ = arburg(x, p)
        return a[1:], err
    if method == "levinson":
        n = x.shape[0]
        if x.ndim == 1:
            R = xcorr(x, scaling="biased")[n - 1:]
        else:
            # batched biased autocorrelation: only the p+1 needed lags,
            # as shifted elementwise products (no per-channel FFTs)
            xc = jnp.conj(x)
            R = jnp.stack([jnp.sum(xc[: n - l] * x[l:], axis=0) / n
                           for l in range(p + 1)], axis=0)
        a, err, _ = levinson(R, p)
        return a, err
    raise ValueError("method must be 'burg' or 'levinson'")
