"""Pallas TPU kernel v2 for block-polyphase rational resampling.

The XLA block-matmul path (stream_filt._block_matmul) is frame-
materialization-bound on TPU: each of its q+1 shifted (B, M) frame
parts is a strided reshape of the whole signal that XLA materializes
lane-padded in HBM (M = 160 pads to 256 lanes), and the (B, L) result
pays the same padding on the way out — measured v5e 147//160 x 10M:
0.87 ms where the minimum traffic is ~94 us (reference hot loop
stream_filt.jl:476-515).

This kernel is zero-copy on both sides. Geometry: outputs and inputs
align every `k` blocks, k chosen so one *superchunk* is both
lane-exact and sublane-exact:

    k*M % 1024 == 0 and k*L % 128 == 0
    P_in  = k*M/128 input rows  per superchunk (multiple of 8)
    O_r   = k*L/128 output rows per superchunk

Within a superchunk the input-row -> output-row mapping is a fixed
banded lane-mixing structure: output row class c (of O_r) reads input
rows r_lo(c) .. r_lo(c)+D-1 and

    Y[c] = sum_d X[r_lo(c)+d] @ T[c,d],   T[c,d] 128x128

where T[c,d] scatters each output lane's taps-per-phase PFB column at
its window offset (host-built via one numpy scatter per tap). The
kernel grid walks S-superchunk tiles; per tile the input block
(S*P_in, 128) and output block (S*O_r, 128) are resident in VMEM, the
class loop is python-static, each (c, d) is ONE strided sublane load
A[r_lo(c)+d :: P_in] -> (S, 128), one (S,128)@(128,128) MXU matmul,
and each class ends with ONE strided sublane store to the contiguous
output block. The signal is consumed as its natural (rows, 128)
bitcast — no pads, no reshapes, no frame materialization. Tap tables
stream from HBM in class groups with double-buffered manual DMA (the
full table, O_r*D*64 KB, can exceed VMEM).

Superchunk-boundary rows (a class window crossing into the next
superchunk, or the zero history before the signal start) read the
full-S strided band one super off, realign with pltpu.roll, and
substitute the tile-crossing super from two 8-row side views via a
where on the super iota (Mosaic lowers roll/where but not the
scatter that .at[].set would emit).

v1 scope: stateless zero-history streams (fresh/reset FIRFilter — the
`resample()` path), real f32, 1-D. The streaming-history case falls
back to the XLA block matmul.
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

__all__ = ["pfb2_supported", "pfb2_plan", "pfb2_resample_pallas",
           "pfb2_table_nbytes", "pallas_available"]


def _superchunk(L, M):
    """Smallest k with k*M % 1024 == 0 (P_in a multiple of 8 rows) and
    k*L % 128 == 0 (whole output rows)."""
    k = 1024 // math.gcd(M, 1024)
    k *= 128 // math.gcd(k * L, 128)
    assert k * M % 1024 == 0 and k * L % 128 == 0
    return k


def pfb2_supported(L, M, taps, dtype):
    if not pallas_available:
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if L < 1 or M < 1 or taps < 2:
        return False
    k = _superchunk(L, M)
    if k * M // 128 > 4096:  # degenerate geometry (huge superchunks)
        return False
    # boundary spill must fit the 8-row side views
    return (M + taps - 1) <= 7 * 128 and taps - 1 <= 8 * 128


def _class_geometry(taps, L, M, phi0, deficit):
    """Window starts/PFB columns per output lane of each class, and
    the per-class input-row band — the geometry alone, without the
    O(O_r*D*128*128) table build."""
    k = _superchunk(L, M)
    P_in = k * M // 128
    O_r = k * L // 128
    # window start (x coords, may be negative: zero history) and
    # PFB column per output lane of each class
    j = np.arange(k * L)
    b, p = j // L, j % L
    q = phi0 - 1 + M * p
    w = (deficit - 1 - (taps - 1)) + b * M + q // L
    col = q % L
    w = w.reshape(O_r, 128)
    col = col.reshape(O_r, 128)
    r_lo = np.floor_divide(w.min(axis=1), 128)            # (O_r,)
    r_hi = np.floor_divide(w.max(axis=1) + taps - 1, 128)
    D_c = (r_hi - r_lo + 1).astype(np.int64)              # per-class band
    return k, P_in, O_r, w, col, r_lo, D_c


def pfb2_table_nbytes(taps, L, M, phi0, deficit):
    """Predicted ragged-packed tap-table size in bytes, from the window
    geometry alone — lets the dispatch gate reject non-resident configs
    without paying the multi-MB table build (the full _Pfb2Plan for
    147//160 allocates a ~38 MB dense intermediate)."""
    *_, D_c = _class_geometry(taps, L, M, int(phi0), int(deficit))
    return int(D_c.sum()) * 128 * 128 * 4


class _Pfb2Plan:
    """Host geometry + tables for one (pfb, L, M, phi0, deficit)."""

    __slots__ = ("k", "P_in", "O_r", "D", "D_c", "D_avg", "off", "tab",
                 "r_lo", "L", "M", "taps", "groups", "tab_dev")

    def __init__(self, pfb, L, M, phi0, deficit):
        taps, nphi = pfb.shape
        assert nphi == L
        k, P_in, O_r, w, col, r_lo, D_c = _class_geometry(
            taps, L, M, phi0, deficit)
        D = int(D_c.max())
        tab = np.zeros((O_r, D, 128, 128), np.float32)
        c_idx = np.repeat(np.arange(O_r), 128)
        l_idx = np.tile(np.arange(128), O_r)
        wf = w.reshape(-1)
        cf = col.reshape(-1)
        pfb32 = pfb.astype(np.float32)
        for t in range(taps):
            pos = wf + t
            r, lane = np.floor_divide(pos, 128), np.mod(pos, 128)
            d = r - r_lo[c_idx]
            np.add.at(tab, (c_idx, d, lane, l_idx), pfb32[t, cf])
        # ragged packing: most classes span D_c < D rows (the window
        # width taps + 128*M/L rarely crosses the worst-case number of
        # 128-sample rows) — packing the flat table by D_c instead of
        # dense D cuts the dominant streamed-table HBM traffic and
        # skips the all-zero band matmuls
        self.D_c = tuple(int(v) for v in D_c)
        self.D_avg = float(D_c.mean())
        off = np.zeros(O_r + 1, np.int64)
        np.cumsum(D_c, out=off[1:])
        self.off = tuple(int(v) * 128 for v in off)       # row offsets
        self.tab = np.concatenate(
            [tab[c, : self.D_c[c]].reshape(-1, 128) for c in range(O_r)],
            axis=0)
        self.k, self.P_in, self.O_r, self.D = k, P_in, O_r, D
        self.r_lo = r_lo.astype(np.int64)
        self.L, self.M, self.taps = L, M, taps
        # contiguous class groups for table streaming, ~2 MB (4096
        # rows) per group: (c0, c1, row0, nrows) with python-static
        # bounds so each group's DMA has a static slice
        gcap = 4096
        groups = []
        c0 = 0
        while c0 < O_r:
            c1 = c0 + 1
            while (c1 < O_r
                   and self.off[c1 + 1] - self.off[c0] <= gcap):
                c1 += 1
            groups.append((c0, c1, self.off[c0],
                           self.off[c1] - self.off[c0]))
            c0 = c1
        self.groups = tuple(groups)
        self.tab_dev = None      # device copy, uploaded once on use


_plan_cache = {}


def pfb2_plan(pfb, L, M, phi0, deficit):
    pfb = np.asarray(pfb)
    key = (L, M, phi0, deficit, pfb.shape[0], hash(pfb.tobytes()))
    hit = _plan_cache.get(key)
    if hit is None:
        if len(_plan_cache) > 64:
            _plan_cache.clear()
        hit = _plan_cache[key] = _Pfb2Plan(pfb, L, M, phi0, deficit)
    return hit


def _make_kernel(S, P_in, O_r, groups, D_c, off, r_lo, prec, R_sig,
                 resident=False):
    """Kernel body with all class geometry baked as python constants.
    Args: xa (S*P_in, 128) input tile, xprev/xnext (1, 8, 128) side
    views, tab_hbm (sum_c D_c*128, 128) ragged-packed tables in HBM,
    o_ref (S*O_r, 128), scratch (2, max_group_rows, 128), sem (2,).
    Rows at or after the signal end (absolute row >= R_sig) are
    zero-masked: the last partial output row mixes valid and
    past-the-end lanes, and an unmasked OOB read would poison the
    valid lanes through the lane-mixing matmul. With resident=True the
    whole table rides in VMEM as a constant block (small ratios — no
    DMA machinery) and the kernel takes no scratch/sem args."""

    def kern(xa, xprev, xnext, tab_hbm, o_ref, scratch=None, sem=None):
        st = pl.program_id(0)
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32,
                                precision=prec)
        sup = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        base = st * (S * P_in)

        def masked(rows, rr, nsup, supv):
            live = base + rr + P_in * supv < R_sig
            return jnp.where(live, rows, 0.0)

        def start_copy(g, slot):
            c0, c1, row0, nrows = groups[g]
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(row0, nrows), :],
                scratch.at[slot, pl.ds(0, nrows), :],
                sem.at[slot]).start()

        if not resident:
            start_copy(0, 0)
        for g in range(len(groups)):
            slot = g % 2
            c0, c1, row0, nrows = groups[g]
            if not resident:
                if g + 1 < len(groups):
                    start_copy(g + 1, (g + 1) % 2)
                pltpu.make_async_copy(
                    tab_hbm.at[pl.ds(row0, nrows), :],
                    scratch.at[slot, pl.ds(0, nrows), :],
                    sem.at[slot]).wait()
            for c in range(c0, c1):
                r0c = r_lo[c]
                acc = None
                for d in range(D_c[c]):
                    rr = r0c + d
                    if resident:
                        T = tab_hbm[off[c] + d * 128:
                                    off[c] + (d + 1) * 128, :]
                    else:
                        loc = off[c] - row0
                        T = scratch[slot, loc + d * 128:
                                    loc + (d + 1) * 128, :]
                    if rr < 0:
                        # super s needs in-tile row s*P_in + rr (the
                        # previous super's tail); one full-S strided
                        # read at start P_in+rr gives element s =
                        # need(s+1), so roll(+1) realigns (row 0 wraps
                        # garbage) and super 0's row — the previous
                        # TILE's tail (zero history at st==0) — is
                        # substituted by a where on the super iota.
                        # (.at[].set is a scatter, which Mosaic does
                        # not lower — roll+where only.)
                        rows = xa[pl.Slice(P_in + rr, S, P_in), :]
                        y = pltpu.roll(dot(rows, T), 1, axis=0)
                        prev = dot(xprev[0, 8 + rr, :][None, :], T)
                        prev = jnp.where(st > 0, prev, 0.0)
                        live = base + rr + P_in * sup < R_sig
                        part = jnp.where(live,
                                         jnp.where(sup == 0, prev, y),
                                         0.0)
                    elif rr >= P_in:
                        # super s needs row s*P_in + rr (the NEXT
                        # super's head); a full-S strided read at
                        # start rr-P_in gives element s = need(s-1):
                        # roll(-1) realigns (last row wraps garbage)
                        # and super S-1 — the next tile's head — is
                        # substituted via the super iota.
                        rows = xa[pl.Slice(rr - P_in, S, P_in), :]
                        # roll by S-1 == roll by -1 (shift must be
                        # non-negative)
                        y = pltpu.roll(dot(rows, T), S - 1, axis=0)
                        nxt = dot(xnext[0, rr - P_in, :][None, :], T)
                        live = base + rr + P_in * sup < R_sig
                        part = jnp.where(live,
                                         jnp.where(sup == S - 1, nxt,
                                                   y),
                                         0.0)
                    else:
                        rows = xa[pl.Slice(rr, S, P_in), :]
                        part = dot(masked(rows, rr, S, sup), T)
                    acc = part if acc is None else acc + part
                o_ref[pl.Slice(c, S, O_r), :] = acc

    return kern


@functools.partial(jax.jit, static_argnames=(
    "S", "P_in", "O_r", "groups", "D_c", "off", "r_lo_t", "nst",
    "precision", "interpret", "n", "hist_len", "out_len"))
def _pfb2_jit(x2, tab, S, P_in, O_r, groups, D_c, off, r_lo_t, nst,
              precision, interpret, n=None, hist_len=0, out_len=None):
    # Mosaic does not lower Precision.HIGH for dot; "high" aliases to
    # HIGHEST (measured on v5e: DEFAULT is slower than HIGHEST here —
    # the lane-mixing tables are f32 and the bf16 split costs passes)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    R = x2.shape[0]
    R8 = max(R // 8, 1)
    x8 = x2[: R8 * 8].reshape(R8, 8, 128)
    tile_rows = S * P_in
    t8 = tile_rows // 8
    tab_rows = off[-1]
    # small tables ride whole in VMEM (no DMA machinery): saves the
    # per-tile group streaming for the common small-ratio kernels
    resident = tab_rows * 128 * 4 <= (4 << 20)
    max_grp = max(g[3] for g in groups)
    kern = _make_kernel(S, P_in, O_r, groups, D_c, off, r_lo_t, prec,
                        R, resident=resident)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nst * S * O_r, 128),
                                       jnp.float32),
        grid=(nst,),
        in_specs=[
            pl.BlockSpec((tile_rows, 128), lambda st: (st, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128),
                         lambda st: (jnp.maximum(st * t8 - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128),
                         lambda st: (jnp.minimum(
                             (st + 1) * t8, R8 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((tab_rows, 128), lambda st: (0, 0),
                          memory_space=pltpu.VMEM) if resident
             else pl.BlockSpec(memory_space=pltpu.HBM)),
        ],
        out_specs=pl.BlockSpec((S * O_r, 128), lambda st: (st, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([] if resident else [
            pltpu.VMEM((2, max_grp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]),
        interpret=interpret,
    )(x2, x8, x8, tab)
    if out_len is not None:
        out = out.reshape(-1)[:out_len]
    if hist_len:
        # streaming-history tail fused into the same program: an
        # eager x[n-hl:] slice of a large 1-D device signal costs
        # ~0.5 ms in XLA relayouts per call (measured: the FIRFilter
        # wrapper ran 2.0 ms where the kernel alone runs 0.95)
        hist = jax.lax.dynamic_slice_in_dim(
            x2.reshape(-1), n - hist_len, hist_len)
        return out, hist
    return out


def pfb2_resample_pallas(x, pfb, L, M, phi0, deficit, out_len,
                         S=None, precision="highest", interpret=False,
                         hist_len=0):
    """Rational polyphase resample of 1-D real f32 `x` (zero history).
    pfb: (taps_per_phi, L) bank (taps2pfb layout). Returns (out_len,)
    f32 matching stream_filt's FIRFilter.filt output exactly; with
    hist_len > 0 returns (y, x[n-hist_len:]) with the history tail
    computed inside the same jitted program (no extra dispatch)."""
    plan = pfb2_plan(pfb, L, M, int(phi0), int(deficit))
    if S is None:
        # measured on v5e 147//160 x 10M: streamed-table plans run
        # best at S=48 (0.834 ms vs 1.007 at S=64); resident-table
        # plans at S=64; S=80+ exceeds the 16 MB VMEM budget
        S = 64 if plan.tab.nbytes <= (4 << 20) else 48
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    R = -(-n // 128)
    if R * 128 != n:
        x = jnp.pad(x, (0, R * 128 - n))
    x2 = x.reshape(R, 128)
    O_r, P_in = plan.O_r, plan.P_in
    out_rows = -(-out_len // 128)
    nsuper = -(-out_rows // O_r)
    S = max(2, min(S, nsuper))
    nst = -(-nsuper // S)
    r_lo_t = tuple(int(v) for v in plan.r_lo)
    # upload the (multi-MB) tap table once per plan, not per call —
    # a fresh host->device transfer of the table can cost more than
    # the kernel (round-2 G-cache lesson, stream_filt._block_args)
    if plan.tab_dev is None:
        plan.tab_dev = jax.device_put(plan.tab)
    tab = plan.tab_dev
    # n is only consumed by the history-tail slice: keying the jit
    # cache on it for hist_len==0 would retrace per distinct un-padded
    # length for no reason
    res = _pfb2_jit(x2, tab, S, P_in, O_r, plan.groups, plan.D_c,
                    plan.off, r_lo_t, nst, precision, interpret,
                    n=(n if hist_len else None),
                    hist_len=int(hist_len), out_len=int(out_len))
    return res
