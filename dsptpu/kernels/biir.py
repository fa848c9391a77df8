"""Pallas TPU kernel: fused block state-space IIR (SOS cascade) filter.

Device-side compainion of filters.filt._blockss_apply (the exact block
state-space form of y_t = d x_t + w'z_{t-1}; z_t = A z_{t-1} + c x_t,
reference semantics Filters/filt.jl:35-65,122-230). The XLA path runs
~10 small HLO ops per filter pass; over a tunneled single chip the
fixed per-op dispatch overhead dominates (measured ~7 ms/pass on v5e
for an 8th-order cascade). This kernel fuses the ENTIRE pass into one
pallas_call:

  * the signal is viewed as rows of V=128 samples (one row = one state
    block, lane-aligned);
  * per grid step, a (TB, 128) chunk of rows is processed:
      Ylocal = X @ F'          (exact impulse-response Toeplitz, MXU)
      U      = X @ K'          (block input -> state increment, padded
                                to 128 state lanes)
      Z      = prefix-scan of z_b = A z_{b-1} + U_b over the TB rows
               via log2(TB) Hillis-Steele steps, each one
               (TB,128) @ (128,128) matmul with A^{2^s} plus a
               sublane roll + mask — no sequential per-row loop;
      Y      = Ylocal + Zstart @ G~  (state -> output, MXU)
  * the running state crosses grid steps through a VMEM scratch row
    (the only sequential dependency, one 128-lane row per chunk).

State dimension p <= 32 (any SOS cascade up to 16 sections) rides in
the first p lanes of a 128-lane row; the A/K/G tables are zero-padded
to 128 so every matmul is lane-aligned.
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

__all__ = ["blockss_filt_pallas", "biir_supported", "pallas_available"]

_V = 128


def biir_supported(ss, dtype):
    return (pallas_available and ss.V == _V and ss.p <= 32
            and jnp.dtype(dtype) == jnp.float32)


def _pad128(m):
    """Zero-pad a (a, b) table to (128, 128)."""
    out = np.zeros((_V, _V))
    out[: m.shape[0], : m.shape[1]] = m
    return out


def _kernel(x_ref, z0_ref, fk_ref, gt_ref, a1t_ref, apow_ref,
            o_ref, o2_ref, carry, *, TB, nsteps, prec, reverse,
            edge_row=None, state_chunk=None, state_row=None):
    """Grid (C, nchunks). x_ref block: (1, TB, 128) rows; z0_ref block
    (1, 1, 128) — 3-D so the per-channel block keeps its trailing dims
    equal to the full array dims (Mosaic blockspec rule for C > 1);
    apow_ref: (nsteps, 128, 128) stacked (A^{2^s})' tables;
    a1t_ref: (128, 128) = A'; carry: (8, 128) scratch, row 0 = state
    entering this chunk.

    With reverse=True (anti-causal pass), the index_maps feed chunks
    right-to-left, the in-chunk scan is a SUFFIX scan, and the
    ft/kt/gt tables are the time-mirrored ones (_dev_tables) — the
    carry then crosses chunks right-to-left."""
    b = pl.program_id(1)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=prec)
    X = x_ref[0]                                       # (TB, 128)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0)
    if reverse and edge_row is not None and edge_row != TB - 1:
        # mid-array injection (filtfilt v2): the first processed chunk
        # enters at row edge_row; its later rows are past the valid
        # region and masked to zero so the suffix scan passes the
        # injected state through untouched
        X = jnp.where((b == 0) & (rows > edge_row), 0.0, X)
        edge = jnp.where(b == 0, edge_row, TB - 1)
    else:
        edge = TB - 1 if reverse else 0

    @pl.when(b == 0)
    def _():
        carry[0:1, :] = z0_ref[0]

    zc = carry[0:1, :]                                 # (1, 128)
    # ONE wide (TB,128)@(128,256) matmul for [Ylocal | U] — the
    # separate F'/K' products each ran at the MXU's N=128 rate
    # (round-4 rule: merge shared-LHS small-N matmuls)
    P = dot(X, fk_ref[:])                              # (TB, 256)
    Ylocal = P[:, :_V]
    U = P[:, _V:]                                      # (TB, 128) states
    # fold the entering state into the first-processed row:
    # u_edge += A @ z_carry
    cin = dot(zc, a1t_ref[:])                          # (1, 128)
    U = U + jnp.where(rows == edge, jnp.broadcast_to(cin, (TB, _V)), 0.0)
    # inclusive scan: prefix z_r = sum_{i<=r} A^{r-i} u_i, or suffix
    # z_r = sum_{i>=r} A^{i-r} u_i for the anti-causal pass
    Z = U
    for s in range(nsteps):
        sh = 1 << s
        if reverse:
            shifted = pltpu.roll(Z, TB - sh, 0)    # cyclic == roll by -sh
            shifted = jnp.where(rows < TB - sh, shifted, 0.0)
        else:
            shifted = pltpu.roll(Z, sh, 0)
            shifted = jnp.where(rows >= sh, shifted, 0.0)
        Z = Z + dot(shifted, apow_ref[s])
    # states entering each row from the processed side
    if reverse:
        zs = pltpu.roll(Z, TB - 1, 0)              # cyclic == roll by -1
        Zstart = jnp.where(rows < TB - 1, zs, 0.0) \
            + jnp.where(rows == edge, jnp.broadcast_to(zc, (TB, _V)), 0.0)
    else:
        zs = pltpu.roll(Z, 1, 0)
        Zstart = jnp.where(rows >= 1, zs, 0.0) \
            + jnp.where(rows == edge, jnp.broadcast_to(zc, (TB, _V)), 0.0)
    Y = Ylocal + dot(Zstart, gt_ref[:])
    o_ref[0] = Y
    if state_chunk is not None:
        # streaming state output: the state AFTER the last complete
        # 128-sample row of the true signal (host advances it through
        # any sub-row tail; forward direction only)
        @pl.when(b == state_chunk)
        def _():
            o2_ref[0] = Z[state_row: state_row + 1, :]
    if reverse:
        carry[0:1, :] = Z[0:1, :]
    else:
        carry[0:1, :] = Z[TB - 1: TB, :]


@functools.partial(jax.jit, static_argnames=("TB", "precision",
                                             "interpret", "reverse",
                                             "nchunks", "edge_row",
                                             "state_chunk", "state_row"))
def _biir_jit(xrows, z0, fk, gt, a1t, apow, TB, precision, interpret,
              reverse=False, nchunks=None, edge_row=None,
              state_chunk=None, state_row=None):
    C, Bp, _ = xrows.shape
    if nchunks is None:
        nchunks = Bp // TB
    nsteps = apow.shape[0]       # may be truncated below log2(TB) —
    # see _dev_tables adaptive scan depth
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    if reverse:
        chunk_map = lambda c, b: (c, nchunks - 1 - b, 0)
    else:
        chunk_map = lambda c, b: (c, b, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, TB=TB, nsteps=nsteps, prec=prec,
                          reverse=reverse, edge_row=edge_row,
                          state_chunk=state_chunk, state_row=state_row),
        out_shape=(jax.ShapeDtypeStruct((C, nchunks * TB, _V),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((C, 1, _V), jnp.float32)),
        grid=(C, nchunks),
        in_specs=[
            pl.BlockSpec((1, TB, _V), chunk_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _V), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_V, 2 * _V), lambda c, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_V, _V), lambda c, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_V, _V), lambda c, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((apow.shape[0], _V, _V), lambda c, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TB, _V), chunk_map,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, _V), lambda c, b: (c, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((8, _V), jnp.float32)],
        interpret=interpret,
    )(xrows, z0, fk, gt, a1t, apow)
    return out


_tab_cache = {}


def _dev_tables(ss, TB, reverse=False):
    """HOST numpy tables (cached); converted to device constants at
    each trace site — caching jnp arrays here would leak tracers
    across jit scopes. reverse=True yields the time-mirrored tables of
    the anti-causal pass (F -> F', K columns / G rows flipped; AV and
    its powers are direction-independent)."""
    # Content-keyed: id(ss) can be reused after the owning _BlockSS is
    # evicted from filters.filt's cache and GC'd, silently serving a
    # previous filter's tables.  The four arrays fully determine the
    # output tables.
    key = (ss.F.tobytes(), ss.K.tobytes(), ss.G.tobytes(),
           ss.AV.tobytes(), TB, reverse)
    hit = _tab_cache.get(key)
    if hit is None:
        nsteps = max((TB - 1).bit_length(), 1)
        # row-vector convention: z_row @ M' == (M @ z)'
        if reverse:
            ft = ss.F.astype(np.float32)                   # X @ (F')'
            kt = _pad128(ss.K[:, ::-1].T).astype(np.float32)
            gt = _pad128(ss.G[::-1].T).astype(np.float32)
        else:
            ft = ss.F.T.astype(np.float32)                 # X @ F'
            kt = _pad128(ss.K.T).astype(np.float32)        # X @ K'
            gt = _pad128(ss.G.T).astype(np.float32)
        a1t = _pad128(ss.AV.T).astype(np.float32)
        pw = np.linalg.matrix_power
        apow_full = [pw(ss.AV, 1 << s) for s in range(nsteps)]
        # adaptive scan depth: AV = A^128 decays like pole_radius^128,
        # so for well-damped filters ||AV^{2^s}|| hits f32 noise after
        # 1-3 doubling steps — truncating the Hillis-Steele there drops
        # only contributions below 1e-9 relative (exact at f32). High-Q
        # filters (poles near the unit circle) keep the full depth.
        keep = nsteps
        for s in range(nsteps):
            if np.linalg.norm(apow_full[s], 2) < 1e-9:
                keep = s + 1      # one sub-noise step still closes the
                break             # prefix over rows beyond 2^s
        apow = np.stack([_pad128(m.T)
                         for m in apow_full[:keep]]).astype(np.float32)
        # merged [F' | K'] RHS: one wide N=256 matmul per chunk
        fk = np.concatenate([ft, kt], axis=1)
        hit = (fk, gt, a1t, apow)
        if len(_tab_cache) > 128:
            _tab_cache.clear()
        _tab_cache[key] = hit
    return hit


def blockss_filt_pallas(ss, x, z0, TB=256, precision="highest",
                        interpret=False, transposed=False,
                        reverse=False, n_eff=None, full_output=False,
                        need_state=False):
    """Apply the block state-space system `ss` (filters.filt._BlockSS,
    V=128) over x (n, C) f32 — or (C, n) lane-major with
    transposed=True, returning (C, n) — with initial state z0 (p, C).
    With need_state=True (forward only, the streaming DF2TFilter /
    sosfilt-si contract, reference Filters/stream_filt.jl:137-210),
    returns (y, z_final (p, C)): the kernel emits the state after the
    last complete 128-sample row through a second tiny output and the
    host advances it through the sub-row tail in closed form
    (z = A^m z_row + sum A^{m-1-j} c x_tail[j]). reverse=True runs the
    anti-causal pass rev(apply(rev(x))) with z0 entering from the
    right — no data flip is materialized (see
    filters.filt._blockss_apply).

    n_eff (reverse only, multiple of 128): process only the first
    n_eff samples, injecting z0 at sample n_eff-1 — rows past n_eff
    are never read as data (filtfilt v2 absorbs the edge extension
    analytically and starts the anti-causal pass at an aligned
    boundary inside the array, avoiding any pad/slice copy).
    full_output=True returns the whole padded (C, chunks*TB*128)
    row buffer unsliced (caller indexes into it)."""
    x = jnp.asarray(x)
    if transposed:
        C, n = x.shape
        xT = x
    else:
        n, C = x.shape
        xT = x.T                                           # (C, n)
    p = ss.p
    if need_state and (reverse or n_eff is not None or n < _V):
        raise ValueError("need_state: forward whole-array passes with "
                         "n >= 128 only")
    edge_row = None
    if n_eff is not None:
        assert reverse and n_eff % _V == 0 and n_eff <= n
        mrows = n_eff // _V
        nchunks = -(-mrows // TB)
        edge_row = (mrows - 1) % TB
        B = -(-n // _V)
        if n % _V:
            xT = jnp.pad(xT, ((0, 0), (0, B * _V - n)))
        if B < nchunks * TB:
            xT = jnp.pad(xT, ((0, 0), (0, (nchunks * TB - B) * _V)))
            B = nchunks * TB
        xrows = xT.reshape(C, B, _V)
    else:
        B = -(-n // _V)
        nchunks = -(-B // TB)
        Bp = nchunks * TB
        npad = Bp * _V - n
        if npad:
            # pad on the side processed LAST so the pad never sits
            # between z0 and the true signal
            xT = jnp.pad(xT, ((0, 0),
                              (npad, 0) if reverse else (0, npad)))
        xrows = xT.reshape(C, Bp, _V)
    state_chunk = state_row = None
    if need_state:
        bfull = n // _V                   # complete true rows
        state_chunk = (bfull - 1) // TB
        state_row = (bfull - 1) % TB
    z0p = jnp.zeros((C, _V), jnp.float32).at[:, :p].set(
        jnp.asarray(z0).T).reshape(C, 1, _V)
    fk, gt, a1t, apow = (jnp.asarray(t)
                         for t in _dev_tables(ss, TB, reverse))
    y, z2 = _biir_jit(xrows, z0p, fk, gt, a1t, apow, TB, precision,
                      interpret, reverse, nchunks=nchunks,
                      edge_row=edge_row, state_chunk=state_chunk,
                      state_row=state_row)
    y = y.reshape(C, nchunks * TB * _V)
    if full_output:
        return y
    if n_eff is not None:
        y = y[:, :n_eff]
    else:
        y = y[:, nchunks * TB * _V - n:] if reverse else y[:, :n]
    if need_state:
        zf = z2[:, 0, :p].T                              # (p, C)
        m = n % _V
        if m:
            # host closed-form advance through the sub-row tail
            Kp = (ss.powers[m - 1::-1] @ ss.c).T         # (p, m)
            xtail = xT[:, n - m: n]                      # (C, m)
            prec2 = jax.lax.Precision.HIGHEST
            zf = (jnp.einsum("ab,bc->ac", jnp.asarray(
                ss.powers[m]).astype(jnp.float32), zf,
                precision=prec2)
                + jnp.dot(xtail, jnp.asarray(Kp.T).astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=prec2).T)
        return (y, zf) if transposed else (y.T, zf)
    return y if transposed else y.T
