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
bitcast — no pads, no reshapes, no frame materialization.

Tables larger than the VMEM residency cap run in GROUPED mode: a
(G, nst) grid with the group index OUTER, classes partitioned into G
contiguous blocks whose packed sub-table rides as one single-buffered
VMEM block indexed by g alone — the Pallas pipeline skips refetching a
block whose index did not change, so each group's table is read from
HBM exactly once per call while the signal is re-read G times (G=3 for
147//160: ~185 MB total traffic vs ~335 MB for the round-3 per-tile
table streaming this mode replaces).

Superchunk-boundary rows (a class window crossing into the next
superchunk, or the zero history before the signal start) read the
full-S strided band one super off, realign with pltpu.roll, and
substitute the tile-crossing super from two 8-row side views via a
where on the super iota (Mosaic lowers roll/where but not the
scatter that .at[].set would emit).

Scope: real f32, 1-D. Fresh/reset streams (the `resample()` path)
pass a pre-shaped (R, 128) signal (eager zero-copy reshape);
mid-stream chunks (round 5) pass 1-D x + the carried history, which
concatenate in-jit, with the class-window geometry shifted by
history_len — exactly the XLA block matmul's s0 (reference chunked
state semantics, stream_filt.jl:443-467). Channels and sub-tile
chunks (< 8 rows) fall back to the XLA block matmul.
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


def pfb2_default_on(taps, L, M, phi0, deficit, max_G=3):
    """Analytic dispatch verdict (no table build): True where the
    kernel measured faster than the XLA block matmul on v5e — resident
    plans (whole table in VMEM) and grouped plans with few groups (the
    grouped kernel re-reads the signal once per group, so its traffic
    win over XLA shrinks as G grows; 147//160 is G=3)."""
    *_, D_c = _class_geometry(taps, L, M, int(phi0), int(deficit))
    if int(D_c.sum()) * 128 * 128 * 4 <= _RESIDENT_CAP:
        return True
    _, G, _ = _group_partition(D_c)
    return 1 < G <= max_G


_RESIDENT_CAP = 4 << 20      # whole table rides in VMEM below this
_GRP_CAP_ROWS = 15360        # 7.5 MB per single-buffered group block


def _group_partition(D_c, cap_rows=_GRP_CAP_ROWS):
    """Largest class-block size Cg (< O_r) dividing O_r whose packed
    per-group table fits cap_rows; returns (Cg, G, rows_per_group).
    Fewer groups = fewer re-reads of the signal (the grouped kernel's
    input traffic scales with G)."""
    Dc = np.asarray(D_c)
    O_r = len(Dc)
    for C in sorted((c for c in range(1, O_r) if O_r % c == 0),
                    reverse=True):
        G = O_r // C
        rows = [int(Dc[g * C:(g + 1) * C].sum()) * 128 for g in range(G)]
        if max(rows) <= cap_rows:
            return C, G, rows
    return 1, O_r, [int(v) * 128 for v in Dc]


class _Pfb2Plan:
    """Host geometry + tables for one (pfb, L, M, phi0, deficit)."""

    __slots__ = ("k", "P_in", "O_r", "D", "D_c", "D_avg", "off", "tab",
                 "r_lo", "L", "M", "taps", "tab_dev",
                 "Cg", "G", "grp_stride", "tabg", "off_rel", "tabg_dev")

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
        self.tab_dev = None      # device copy, uploaded once on use
        # grouped mode (tables too big for VMEM residency): classes
        # partitioned into G contiguous blocks of Cg = O_r/G; each
        # group's ragged table packs at a uniform grp_stride so the
        # group block rides as ONE single-buffered VMEM BlockSpec that
        # stays resident across all signal tiles of that group (the
        # round-3 streamed mode re-DMA'd the whole table per tile —
        # ~7x the signal traffic for 147//160)
        if self.tab.nbytes <= _RESIDENT_CAP:
            self.Cg, self.G = O_r, 1
            grp_rows = None
        else:
            self.Cg, self.G, grp_rows = _group_partition(D_c)
        if self.G > 1:
            self.grp_stride = -(-max(grp_rows) // 8) * 8
            tabg = np.zeros((self.G * self.grp_stride, 128), np.float32)
            for g in range(self.G):
                r0 = self.off[g * self.Cg]
                tabg[g * self.grp_stride:
                     g * self.grp_stride + grp_rows[g]] = \
                    self.tab[r0: r0 + grp_rows[g]]
            self.tabg = tabg
            self.off_rel = tuple(
                self.off[c] - self.off[(c // self.Cg) * self.Cg]
                for c in range(O_r))
        else:
            self.grp_stride = 0
            self.tabg = None
            self.off_rel = self.off[:-1]
        self.tabg_dev = None


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


def _class_body(xa, xprev, xnext, st, sup, dot, S, P_in, R_sig,
                r_lo_c, D_c_c, tab_at):
    """Accumulate one output class: sum over the D_c band rows of a
    strided (S, 128) load @ the class's 128x128 lane-mixing table.
    Boundary rows (a window reaching into the previous/next super)
    realign a one-super-off strided read with pltpu.roll and substitute
    the tile-crossing super from the 8-row side views via a where on
    the super iota (.at[].set is a scatter, which Mosaic does not
    lower). Rows at/after the signal end (absolute row >= R_sig) are
    zero-masked: the last partial output row mixes valid and
    past-the-end lanes, and an unmasked OOB read would poison the valid
    lanes through the lane-mixing matmul."""
    base = st * (S * P_in)
    acc = None
    for d in range(D_c_c):
        rr = r_lo_c + d
        T = tab_at(d)
        if rr < 0:
            # super s needs in-tile row s*P_in + rr (the previous
            # super's tail); one full-S strided read at start P_in+rr
            # gives element s = need(s+1), so roll(+1) realigns (row 0
            # wraps garbage) and super 0's row — the previous TILE's
            # tail (zero history at st==0) — is substituted from xprev.
            rows = xa[pl.Slice(P_in + rr, S, P_in), :]
            y = pltpu.roll(dot(rows, T), 1, axis=0)
            prev = dot(xprev[0, 8 + rr, :][None, :], T)
            prev = jnp.where(st > 0, prev, 0.0)
            live = base + rr + P_in * sup < R_sig
            part = jnp.where(live, jnp.where(sup == 0, prev, y), 0.0)
        elif rr >= P_in:
            # super s needs row s*P_in + rr (the NEXT super's head); a
            # full-S strided read at start rr-P_in gives element s =
            # need(s-1): roll(-1) realigns (last row wraps garbage) and
            # super S-1 — the next tile's head — comes from xnext.
            rows = xa[pl.Slice(rr - P_in, S, P_in), :]
            # roll by S-1 == roll by -1 (shift must be non-negative)
            y = pltpu.roll(dot(rows, T), S - 1, axis=0)
            nxt = dot(xnext[0, rr - P_in, :][None, :], T)
            live = base + rr + P_in * sup < R_sig
            part = jnp.where(live, jnp.where(sup == S - 1, nxt, y), 0.0)
        else:
            rows = xa[pl.Slice(rr, S, P_in), :]
            live = base + rr + P_in * sup < R_sig
            part = dot(jnp.where(live, rows, 0.0), T)
        acc = part if acc is None else acc + part
    return acc


def _make_kernel_resident(S, P_in, O_r, D_c, off, r_lo, prec, R_sig):
    """1-D grid over signal tiles; the whole ragged-packed table rides
    in VMEM as a constant block. Args: xa (S*P_in, 128) input tile,
    xprev/xnext (1, 8, 128) side views, tab (rows, 128) table,
    o_ref (S*O_r, 128)."""

    def kern(xa, xprev, xnext, tab, o_ref):
        st = pl.program_id(0)
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32,
                                precision=prec)
        sup = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        for c in range(O_r):
            acc = _class_body(
                xa, xprev, xnext, st, sup, dot, S, P_in, R_sig,
                r_lo[c], D_c[c],
                lambda d, c=c: tab[off[c] + d * 128:
                                   off[c] + (d + 1) * 128, :])
            o_ref[pl.Slice(c, S, O_r), :] = acc

    return kern


def _make_kernel_grouped(S, P_in, O_r, Cg, G, D_c, off_rel, r_lo, prec,
                         R_sig):
    """2-D grid (group, signal tile), group OUTER: the current group's
    packed table block is indexed by g only, so the Pallas pipeline
    fetches it ONCE per group and it stays resident across every signal
    tile (the round-3 streamed mode paid the full table per tile, ~7x
    the signal traffic at 147//160). Each grid step computes the
    group's Cg classes for one tile; the class geometry is baked as
    python constants per pl.when(g == gi) branch. Output block is the
    (S, 1, Cg, 128) slice of the (nst*S, G, Cg, 128) buffer, which is
    time-major when flattened (classes are assigned to groups in
    order). Reference hot loop: stream_filt.jl:476-515."""

    def kern(xa, xprev, xnext, tabg, o_ref):
        g = pl.program_id(0)
        st = pl.program_id(1)
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32,
                                precision=prec)
        sup = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        for gi in range(G):
            @pl.when(g == gi)
            def _(gi=gi):
                for ci in range(Cg):
                    c = gi * Cg + ci
                    acc = _class_body(
                        xa, xprev, xnext, st, sup, dot, S, P_in, R_sig,
                        r_lo[c], D_c[c],
                        lambda d, c=c: tabg[off_rel[c] + d * 128:
                                            off_rel[c] + (d + 1) * 128,
                                            :])
                    o_ref[:, 0, ci, :] = acc

    return kern


def _finish(out, x2, n, hist_len, out_len):
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


# Mosaic does not lower Precision.HIGH for dot; "high" aliases to
# HIGHEST (measured on v5e: DEFAULT is slower than HIGHEST here —
# the lane-mixing tables are f32 and the bf16 split costs passes)
_PRECS = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGHEST,
          "default": jax.lax.Precision.DEFAULT}


def _prep_x2(hist, x, n_static):
    """Input front-end. FRESH streams arrive pre-shaped 2-D (the
    eager (n,)->(R,128) reshape is the zero-copy layout the kernel
    consumes; doing it IN-jit lets XLA interpose a relayout copy
    before the custom call — device-measured 3x slower at 147//160,
    0.61 -> 1.5-2.0 ms). STREAMING chunks arrive 1-D with a history
    to concat in-jit (one fused copy beats three eager dispatches)."""
    if x.ndim == 2:
        return x, n_static
    xc = jnp.concatenate([hist, x]) if hist.shape[0] else x
    n0 = xc.shape[0]
    R = -(-n0 // 128)
    if R * 128 != n0:
        xc = jnp.pad(xc, (0, R * 128 - n0))
    return xc.reshape(R, 128), n0


@functools.partial(jax.jit, static_argnames=(
    "S", "P_in", "O_r", "D_c", "off", "r_lo_t", "nst",
    "precision", "interpret", "n", "hist_len", "out_len"))
def _pfb2_jit(hist, x, tab, S, P_in, O_r, D_c, off, r_lo_t, nst,
              precision, interpret, n=None, hist_len=0, out_len=None):
    x2, n = _prep_x2(hist, x, n)
    prec = _PRECS[precision]
    R = x2.shape[0]
    R8 = max(R // 8, 1)
    x8 = x2[: R8 * 8].reshape(R8, 8, 128)
    tile_rows = S * P_in
    t8 = tile_rows // 8
    tab_rows = off[-1] + D_c[-1] * 128
    kern = _make_kernel_resident(S, P_in, O_r, D_c, off, r_lo_t, prec, R)
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
            pl.BlockSpec((tab_rows, 128), lambda st: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S * O_r, 128), lambda st: (st, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, x8, x8, tab)
    return _finish(out, x2, n, hist_len, out_len)


@functools.partial(jax.jit, static_argnames=(
    "S", "P_in", "O_r", "Cg", "G", "grp_stride", "D_c", "off_rel",
    "r_lo_t", "nst", "precision", "interpret", "n", "hist_len",
    "out_len"))
def _pfb2_jit_grouped(hist, x, tabg, S, P_in, O_r, Cg, G, grp_stride,
                      D_c, off_rel, r_lo_t, nst, precision, interpret,
                      n=None, hist_len=0, out_len=None):
    x2, n = _prep_x2(hist, x, n)
    prec = _PRECS[precision]
    R = x2.shape[0]
    R8 = max(R // 8, 1)
    x8 = x2[: R8 * 8].reshape(R8, 8, 128)
    tile_rows = S * P_in
    t8 = tile_rows // 8
    kern = _make_kernel_grouped(S, P_in, O_r, Cg, G, D_c, off_rel,
                                r_lo_t, prec, R)
    # the group table is single-buffered: its block index changes only
    # at group boundaries (G-1 times per call), so double-buffering
    # would spend grp_stride*512 bytes of VMEM to hide G-1 transfers
    tab_spec = pl.BlockSpec((grp_stride, 128), lambda g, st: (g, 0),
                            memory_space=pltpu.VMEM)
    if not interpret:
        tab_spec = pl.BlockSpec((grp_stride, 128), lambda g, st: (g, 0),
                                memory_space=pltpu.VMEM,
                                pipeline_mode=pl.Buffered(buffer_count=1))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nst * S, G, Cg, 128),
                                       jnp.float32),
        grid=(G, nst),
        in_specs=[
            pl.BlockSpec((tile_rows, 128), lambda g, st: (st, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128),
                         lambda g, st: (jnp.maximum(st * t8 - 1, 0),
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128),
                         lambda g, st: (jnp.minimum(
                             (st + 1) * t8, R8 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            tab_spec,
        ],
        out_specs=pl.BlockSpec((S, 1, Cg, 128),
                               lambda g, st: (st, g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, x8, x8, tabg)
    return _finish(out, x2, n, hist_len, out_len)


def pfb2_resample_pallas(x, pfb, L, M, phi0, deficit, out_len,
                         S=None, precision="highest", interpret=False,
                         hist_len=0, hist=None):
    """Rational polyphase resample of 1-D real f32 `x`. pfb:
    (taps_per_phi, L) bank (taps2pfb layout). Returns (out_len,) f32
    matching stream_filt's FIRFilter.filt output exactly; with
    hist_len > 0 returns (y, xcat[n-hist_len:]) with the history tail
    computed inside the same jitted program (no extra dispatch).

    Streaming history: pass the carried samples in `hist` (1-D; they
    are concatenated in-jit) and the SHIFTED deficit
    `deficit + len(hist)` — the class-window geometry measures starts
    from the concatenated signal's origin, exactly like the XLA block
    matmul's s0 (stream_filt._block_args); reference chunked-state
    semantics stream_filt.jl:443-467."""
    plan = pfb2_plan(pfb, L, M, int(phi0), int(deficit))
    grouped = plan.G > 1
    if S is None:
        if grouped:
            # VMEM budget: 1x group table + 2x input tile + 2x out tile
            # (+ side views); solve for S, snap down to a multiple of 8.
            # 18 MB budget: S=48 compiles and measured fastest for
            # 147//160 on v5e (0.396 ms vs 0.520 at S=32 — the 14 MB
            # budget's pick); Mosaic evidently double-buffers less
            # than the naive 2x-every-block accounting assumes
            free = (18 << 20) - plan.grp_stride * 512
            S = max(free // ((plan.P_in + plan.Cg) * 1024), 8)
            S = min((S // 8) * 8, 64)
        else:
            # measured on v5e: resident-table plans run best at S=64;
            # S=80+ exceeds the 16 MB VMEM budget
            S = 64
    x = jnp.asarray(x, jnp.float32)
    if hist is None:
        # fresh stream: eager zero-copy (R,128) reshape OUTSIDE the
        # jit (see _prep_x2 — the in-jit form relayouts 3x slower)
        hist = jnp.zeros((0,), jnp.float32)
        n = x.shape[0]
        R = -(-n // 128)
        if R * 128 != n:
            x = jnp.pad(x, (0, R * 128 - n))
        x = x.reshape(R, 128)
        n_key = n if hist_len else None
    else:
        hist = jnp.asarray(hist, jnp.float32)
        n_key = None
    O_r, P_in = plan.O_r, plan.P_in
    out_rows = -(-out_len // 128)
    nsuper = -(-out_rows // O_r)
    S = max(2, min(S, nsuper))
    nst = -(-nsuper // S)
    r_lo_t = tuple(int(v) for v in plan.r_lo)
    if grouped:
        # upload the (multi-MB) tap table once per plan, not per call —
        # a fresh host->device transfer of the table can cost more than
        # the kernel (round-2 G-cache lesson, stream_filt._block_args)
        if plan.tabg_dev is None:
            plan.tabg_dev = jax.device_put(plan.tabg)
        return _pfb2_jit_grouped(
            hist, x, plan.tabg_dev, S, P_in, O_r, plan.Cg, plan.G,
            plan.grp_stride, plan.D_c, plan.off_rel, r_lo_t, nst,
            precision, interpret, n=n_key, hist_len=int(hist_len),
            out_len=int(out_len))
    if plan.tab_dev is None:
        plan.tab_dev = jax.device_put(plan.tab)
    return _pfb2_jit(hist, x, plan.tab_dev, S, P_in, O_r, plan.D_c,
                     plan.off[:-1], r_lo_t, nst, precision, interpret,
                     n=n_key, hist_len=int(hist_len),
                     out_len=int(out_len))
