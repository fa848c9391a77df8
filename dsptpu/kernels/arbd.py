"""Pallas TPU kernel for near-unity arbitrary-rate resampling.

Replaces the XLA drift-scan path (stream_filt._pfb_dot_arb_drift) for
the practical clock-drift case (reference stream_filt.jl:567-625). The
XLA path is HBM-bound on its (positions, nphi) z tensor (~13 ms / 10M
on v5e, 755 MS/s); here z never leaves VMEM.

Geometry (round-5 DESIGN.md candidate 1, de-risked by probes
p263/p264: in-bounds dynamic Blocked indices, in-kernel dynamic
8-aligned row slices, dynamic-shift pltpu.roll on both axes):

  * positions-on-lanes: position u = window start in the padded signal
    xp; all per-position arrays (phase, alpha, z, selected output) live
    as (rows, 128) with u = 128*row + lane — no lane/sublane regrouping
    anywhere.
  * all-phase PFB evaluation as TWO wide resident lane-mixing matmuls
    (window rows r and r+1): (XP,128) @ (128,128*nphi) at HIGHEST,
    phase-major on columns — the pfb2-style tap table absorbs the
    tap/lane geometry, the 128-lane contraction carries a 128/taps
    FLOP overcount (4x at 32 taps) as the price of MXU dense shapes,
    and the single wide shared-RHS matmul keeps the MXU at its big-N
    rate (v2 ran 16 N=512 group matmuls per step).
  * per-step dynamic input: the grid walks SEG-output blocks whose
    input row origin row0_i drifts (prefetched); x / phiq / alphq each
    arrive as TWO consecutive dynamically-indexed blocks, concatenated
    into VMEM scratch and sliced at the (8-aligned) in-scratch offset.
  * phase/alpha select: one nphi-iteration VPU loop accumulates
    A = z[phi] and N = z[phi+1] via (ph == p) masks; the reference's
    derivative bank satisfies dpfb = lo_{phi+1} - lo_phi with two
    analytic boundary terms (phase-wrap partner z_0(u+1) - h0*xp[u+W],
    broken-telescope + hL*xp[u+tstar] at phi == pstar), applied
    exactly as in the XLA drift path. y = A + alpha*(N - A).
  * drift compaction: within a block the output->position drift
    dv(m) = u(m) - m - 128*row0_i is a piecewise-constant staircase
    with few steps (rate near 1); the host plans <= NSEG segments and
    the kernel assembles y[m] = zsel[m + v_s] per segment with two
    dynamic sublane rolls + two dynamic lane rolls + a flat-index mask.

Scope v1: fresh or streaming 1-D real f32 (history rides in xcat like
the XLA paths), no duplicate positions (rate <= 1; dups fall back),
taps_per_phi <= 128, nphi % 4 == 0, out_len >= 1 block. Everything
else falls back to the XLA drift/all-phase paths.
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    pallas_available = True
except Exception:  # pragma: no cover
    pallas_available = False

__all__ = ["arbd_supported", "arbd_plan", "arbd_resample_pallas",
           "pallas_available"]

SEG = 32768            # outputs per grid step
NSEG = 40              # max drift segments per block (covers
#                        |1 - 1/rate| <~ 1.2e-3 at SEG=32768; padded
#                        segments are pl.when-skipped at run time)
_XP_CAP = 320          # position rows per step cap (NW <= 40960)


def arbd_supported(nphi, taps, dtype):
    """nphi <= 32: the resident (128, 128*nphi) tap tables plus the
    (XP, 128*nphi) Zall slab scale linearly with nphi (~11 MB total at
    nphi=32, XP<=320) — nphi=64 would need ~21.5 MB against the 16 MB
    scoped-VMEM limit and fail to COMPILE, which interpret-mode CPU
    tests cannot catch."""
    return (pallas_available
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and nphi % 4 == 0 and 4 <= nphi <= 32
            and 2 <= taps <= 128)


def _arbd_tables(pfb, dtype=np.float32):
    """(128, 128*nphi) lane-mixing tap tables for window rows r (TA)
    and r+1 (TB): TA[li, 128*p + lo] = pfb[li - lo, p] for
    0 <= li - lo < taps; TB holds the row-crossing taps
    (t = 128 + li - lo). Phase-major on columns so the whole PFB is
    TWO wide (XP,128)@(128,128*nphi) matmuls (v2 ran 4-phase groups of
    N=512 matmuls; one wide shared-RHS matmul keeps the MXU at its
    big-N rate). Host numpy scatter, float32."""
    taps, nphi = pfb.shape
    TA = np.zeros((128, nphi, 128), dtype)
    TB = np.zeros((128, nphi, 128), dtype)
    lo = np.arange(128)
    for t in range(taps):
        li = lo + t
        in_a = li < 128
        TA[li[in_a], :, lo[in_a]] = pfb[t]
        if (~in_a).any():
            TB[li[~in_a] - 128, :, lo[~in_a]] = pfb[t]
    return (TA.reshape(128, nphi * 128), TB.reshape(128, nphi * 128))


def arbd_plan(x_idx, phi_idx, alpha, out_len, nphi, winlen, xlen):
    """Host plan: per-block input row origins + drift segments +
    position-major phase/alpha arrays. Returns None when the geometry
    falls outside the kernel's scope (fast drift, dups, tiny output).

    x_idx: 1-based input position of each output's window END
    (reference stream_filt.jl:567-577 accumulator semantics); window
    START in xcat coords is u = x_idx - 1 (history_len == winlen - 1).
    xlen = len(xcat) (history + chunk)."""
    if out_len < SEG:
        return None
    assert nphi % 4 == 0 and 2 <= winlen <= 128   # arbd_supported gate
    u = np.asarray(x_idx, np.int64) - 1
    if np.any(np.asarray(x_idx)[:out_len] > xlen):
        return None                       # window past the signal end
    if np.any(u[1:] <= u[:-1] - 1) or np.any(u[1:] == u[:-1]):
        return None                       # dups / non-monotone: XLA path
    niter = -(-out_len // SEG)
    out_pad = niter * SEG
    npad = out_pad - out_len
    if npad:
        u = np.concatenate([u, u[-1] + 1 + np.arange(npad)])
        phi_idx = np.concatenate([phi_idx, np.zeros(npad, np.int64)])
        alpha = np.concatenate([alpha, np.zeros(npad)])
    m = np.arange(out_pad, dtype=np.int64) % SEG
    ub = u.reshape(niter, SEG)
    c = ub - m.reshape(niter, SEG)
    row0 = (c.min(axis=1) // 1024) * 8                    # 8-row aligned
    if row0.min() < 0:
        return None
    dv = (c - 128 * row0[:, None])                        # (niter, SEG)
    if dv.min() < 0:
        return None
    # position span per block (incl. the u+1 wrap partner); NW rounds
    # to 1024 so XP is a multiple of 8 — tpu.dynamic_rotate rejects
    # sublane-unaligned vector shapes (device-probed: (137,128) fails
    # "unsupported unaligned shape", (136,128) compiles)
    nw_need = int((ub.max(axis=1) - 128 * row0).max()) + 3
    NW = -(-nw_need // 1024) * 1024
    XP = NW // 128
    if XP > _XP_CAP:
        return None
    # drift segments: dv piecewise-constant in m
    vseg = np.zeros((niter, NSEG), np.int32)
    mseg = np.full((niter, NSEG), SEG, np.int32)
    mend = np.full((niter, NSEG), SEG, np.int32)
    for i in range(niter):
        steps = np.flatnonzero(np.diff(dv[i])) + 1
        if len(steps) + 1 > NSEG:
            return None
        starts = np.concatenate([[0], steps])
        ends = np.concatenate([steps, [SEG]])
        k = len(starts)
        vseg[i, :k] = dv[i, starts]
        vseg[i, k:] = dv[i, starts[-1]]
        mseg[i, :k] = starts
        mend[i, :k] = ends
    # input geometry: window rows [row0, row0 + XP], fetched as two
    # XB-row blocks; XSL = 8-aligned in-scratch slice size
    XSL = -(-(XP + 2) // 8) * 8
    XB = XSL + 8
    qx = (row0 // XB).astype(np.int32)
    offx = (row0 - qx * XB).astype(np.int32)
    assert offx.min() >= 0 and offx.max() + XSL <= 2 * XB
    assert np.all(offx % 8 == 0)
    # padded signal rows: every fetched block must exist
    Rx = int(qx.max()) + 2
    Rx_rows = Rx * XB
    # position-major phase/alpha (first-wins is safe: no dups)
    npos = Rx_rows * 128
    if u[-1] + 2 >= npos:
        return None                       # would index past the pad
    phiq = np.zeros(npos, np.int32)
    alphq = np.zeros(npos, np.float32)
    phiq[u] = phi_idx
    alphq[u] = alpha
    return dict(niter=niter, XP=XP, XSL=XSL, XB=XB, Rx_rows=Rx_rows,
                qx=qx, offx=offx,
                vseg=vseg.reshape(-1), mseg=mseg.reshape(-1),
                mend=mend.reshape(-1),
                phiq2=phiq.reshape(Rx_rows, 128),
                alphq2=alphq.reshape(Rx_rows, 128))


def _flatshift_static(v0, v1, sh):
    """out[r, l] = flat(v0)[128 r + l + sh] with v1 = v0's next-row
    view; 0 <= sh <= 128 static."""
    if sh == 0:
        return v0
    a = pltpu.roll(v0, 128 - sh, axis=1)
    b = pltpu.roll(v1, 128 - sh, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v0.shape, 1)
    return jnp.where(lane < 128 - sh, a, b)


def _make_kernel(XP, XSL, XB, SEGR, nphi, NSEGk, winlen, h0, hL,
                 pstar, tstar, prec):
    f32 = jnp.float32

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def kern(qx_s, offx_s, vseg_s, mseg_s, mend_s,
             xa, xb, pa, pb, aa, ab, ta, tb,
             o_ref, xscr, pscr, ascr):
        i = pl.program_id(0)
        xscr[pl.ds(0, XB), :] = xa[...]
        xscr[pl.ds(XB, XB), :] = xb[...]
        pscr[pl.ds(0, XB), :] = pa[...]
        pscr[pl.ds(XB, XB), :] = pb[...]
        ascr[pl.ds(0, XB), :] = aa[...]
        ascr[pl.ds(XB, XB), :] = ab[...]
        off = offx_s[i]
        xse = xscr[pl.ds(off, XSL), :]              # (XSL, 128)
        A0 = xse[:XP]
        A1 = xse[1:XP + 1]
        ph = pscr[pl.ds(off, XP), :]
        php1 = ph + 1
        al = ascr[pl.ds(off, XP), :]
        # all-phase z as TWO wide matmuls (XP,128)@(128,128*nphi):
        # round-4 rule — merge per-group small-N matmuls into one wide
        # shared-RHS matmul (N=512 group matmuls ran the MXU at its
        # small-N rate) and do the phase/alpha one-hot select AFTER on
        # the VPU (~free at 11 ns/tile-op)
        Zall = dot(A0, ta[...]) + dot(A1, tb[...])  # (XP, 128*nphi)
        A = jnp.zeros((XP, 128), f32)
        N = jnp.zeros((XP, 128), f32)
        z0 = Zall[:, 0:128]
        for p in range(nphi):
            vp = Zall[:, 128 * p: 128 * (p + 1)]
            A = A + jnp.where(ph == p, vp, 0.0)
            N = N + jnp.where(php1 == p, vp, 0.0)
        # phase-wrap partner: z_0(u+1) - h0 * xp[u + winlen]
        z0n = pltpu.roll(z0, XP - 1, axis=0)        # z0 rows shifted +1
        z0p1 = _flatshift_static(z0, z0n, 1)
        xq1 = _flatshift_static(A0, A1, winlen)
        N = N + jnp.where(ph == nphi - 1, z0p1 - h0 * xq1, 0.0)
        # broken-telescope tap: +hL * xp[u + tstar] at phi == pstar
        xqs = _flatshift_static(A0, A1, tstar)
        N = N + jnp.where(ph == pstar, hL * xqs, 0.0)
        zsel = A + al * (N - A)                     # (XP, 128)
        zsn = pltpu.roll(zsel, XP - 1, axis=0)
        # drift compaction: y[m] = zsel[m + v_s] on segment s; padded
        # segments (m0s == m1s) are skipped at run time
        fi = (128 * jax.lax.broadcasted_iota(jnp.int32, (SEGR, 128), 0)
              + jax.lax.broadcasted_iota(jnp.int32, (SEGR, 128), 1))
        o_ref[...] = jnp.zeros((SEGR, 128), f32)
        for s in range(NSEGk):
            v = vseg_s[i * NSEGk + s]
            m0s = mseg_s[i * NSEGk + s]
            m1s = mend_s[i * NSEGk + s]

            @pl.when(m0s < m1s)
            def _(v=v, m0s=m0s, m1s=m1s):
                vr = v // 128
                vl = v % 128
                b1 = pltpu.roll(zsel, (XP - vr) % XP, axis=0)
                b2 = pltpu.roll(zsn, (XP - vr) % XP, axis=0)
                l1 = pltpu.roll(b1, (128 - vl) % 128, axis=1)
                l2 = pltpu.roll(b2, (128 - vl) % 128, axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (XP, 128), 1)
                vlb = jnp.full((XP, 128), vl, jnp.int32)
                sh = jnp.where(lane < 128 - vlb, l1, l2)[:SEGR]
                o_ref[...] = o_ref[...] + jnp.where(
                    (fi >= m0s) & (fi < m1s), sh, 0.0)

    return kern


@functools.partial(jax.jit, static_argnames=(
    "niter", "XP", "XSL", "XB", "rx_rows", "nphi", "winlen", "h0", "hL",
    "pstar", "tstar", "out_len", "interpret"))
def _arbd_jit(hist, x, phiq2, alphq2, ta, tb, qx, offx, vseg, mseg, mend,
              niter, XP, XSL, XB, rx_rows, nphi, winlen, h0, hL,
              pstar, tstar, out_len, interpret):
    # front-end glue fused into the compiled program: eager
    # concat+cast+pad+reshape cost ~0.7 ms/2.5M over the tunnel
    # (3 dispatches + 2 extra HBM passes); in-jit XLA fuses them into
    # the pipeline's first fetch
    xcat = jnp.concatenate([hist, x]) if hist.shape[0] else x
    xcat = xcat.astype(jnp.float32)
    need = rx_rows * 128
    n = xcat.shape[0]
    xp = jnp.pad(xcat, (0, need - n)) if need > n else xcat[:need]
    x2 = xp.reshape(rx_rows, 128)
    SEGR = SEG // 128
    prec = jax.lax.Precision.HIGHEST
    kern = _make_kernel(XP, XSL, XB, SEGR, nphi, NSEG, winlen,
                        h0, hL, pstar, tstar, prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5, grid=(niter,),
        in_specs=[
            pl.BlockSpec((XB, 128), lambda i, q, o, v, m, e: (q[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, 128),
                         lambda i, q, o, v, m, e: (q[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, 128), lambda i, q, o, v, m, e: (q[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, 128),
                         lambda i, q, o, v, m, e: (q[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, 128), lambda i, q, o, v, m, e: (q[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XB, 128),
                         lambda i, q, o, v, m, e: (q[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            # resident tap tables: constant block index (never
            # refetched); single-buffered to halve their VMEM
            pl.BlockSpec((128, nphi * 128),
                         lambda i, q, o, v, m, e: (0, 0),
                         memory_space=pltpu.VMEM,
                         **({} if interpret else
                            {"pipeline_mode": pl.Buffered(
                                buffer_count=1)})),
            pl.BlockSpec((128, nphi * 128),
                         lambda i, q, o, v, m, e: (0, 0),
                         memory_space=pltpu.VMEM,
                         **({} if interpret else
                            {"pipeline_mode": pl.Buffered(
                                buffer_count=1)})),
        ],
        out_specs=pl.BlockSpec((SEGR, 128),
                               lambda i, q, o, v, m, e: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * XB, 128), jnp.float32),
            pltpu.VMEM((2 * XB, 128), jnp.int32),
            pltpu.VMEM((2 * XB, 128), jnp.float32),
        ])
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((niter * SEGR, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(qx, offx, vseg, mseg, mend,
      x2, x2, phiq2, phiq2, alphq2, alphq2, ta, tb)
    return out.reshape(-1)[:out_len]


class _ArbdDev:
    """Device-resident per-plan arrays (uploaded once per plan)."""

    __slots__ = ("phiq2", "alphq2", "qx", "offx", "vseg", "mseg",
                 "mend", "plan")

    def __init__(self, plan):
        self.plan = plan
        self.phiq2 = jax.device_put(plan["phiq2"])
        self.alphq2 = jax.device_put(plan["alphq2"])
        self.qx = jax.device_put(plan["qx"])
        self.offx = jax.device_put(plan["offx"])
        self.vseg = jax.device_put(plan["vseg"])
        self.mseg = jax.device_put(plan["mseg"])
        self.mend = jax.device_put(plan["mend"])


def arbd_resample_pallas(hist, x, dev, tabs, nphi, winlen, out_len,
                         h0, hL, pstar, tstar, interpret=False):
    """hist: 1-D history (may be length 0) and x: 1-D chunk, on
    device, any float dtype (cast to f32 in-jit); dev: _ArbdDev;
    tabs: (ta, tb) device tables. Returns (out_len,) f32 identical to
    the XLA all-phase/drift paths (1e-12-exactness-tested)."""
    plan = dev.plan
    return _arbd_jit(
        hist, x, dev.phiq2, dev.alphq2, tabs[0], tabs[1],
        dev.qx, dev.offx, dev.vseg, dev.mseg, dev.mend,
        niter=plan["niter"], XP=plan["XP"], XSL=plan["XSL"],
        XB=plan["XB"], rx_rows=plan["Rx_rows"], nphi=nphi,
        winlen=winlen,
        h0=float(h0), hL=float(hL), pstar=int(pstar), tstar=int(tstar),
        out_len=int(out_len), interpret=interpret)
