# (1) Segment-path component timings for the arb-rate bench config.
# (2) In-bounds dynamic Blocked index retest (input AND output).
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu
from dsptpu.filters import stream_filt as sfm
from dsptpu.filters.stream_filt import (_arb_segment_plan, _arb_seg_tables,
                                        _pfb_dot_arb_segments)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rate = 0.9997
h = np.asarray(dsptpu.resample_filter(rate, 32)).astype(np.float32)
n = 2_000_000          # smaller first: this path runs at ~40 MS/s
x = np.random.default_rng(5).standard_normal(n).astype(np.float32)
xj = jax.device_put(x)
k = sfm.FIRFilter(h, rate).kernel
head, alpha, out_len = k.plan(n)
x_idx, phi_idx = head[0], head[1]
sp = _arb_segment_plan(x_idx, phi_idx, out_len, k.nphi, k.taps_per_phi)
assert sp is not None
rows, bounds, Lm, W, gidx = sp
mark(f"nseg={rows.shape[0]} W={W} Lm={Lm} out={out_len}")
G = jnp.asarray(_arb_seg_tables(np.asarray(k.pfb_t).T,
                                np.asarray(k.dpfb_t).T, Lm, W), jnp.float32)
rows_d = jnp.asarray(rows.astype(np.int32))
gidx_d = jnp.asarray(gidx.astype(np.int32))
alpha_d = jnp.asarray(alpha, jnp.float32)

# full path
f_full = jax.jit(lambda xc: _pfb_dot_arb_segments(
    xc, G, rows_d, bounds, Lm, 0, alpha=alpha_d, gidx=gidx_d))
sync(f_full(xj))
t = timeit(f_full, xj, k=4)
mark(f"segment path FULL: {t*1e3:.2f} ms ({n/t/1e6:.0f} MS/s)")

# component: F gather only
f_gather = jax.jit(lambda xc: jnp.take(xc.reshape(-1, 1), rows_d, axis=0,
                                       mode="clip"))
sync(f_gather(xj))
t_g = timeit(f_gather, xj, k=4)
mark(f"F element-gather (n,1): {t_g*1e3:.2f} ms")

# variant: gather rows from (R,128) then take_along_axis within rows
R = n // 128
x2 = xj[: R * 128].reshape(R, 128)
e0 = rows[:, 0]
blk = jnp.asarray((e0 // 128).astype(np.int32))
off = (e0 % 128).astype(np.int32)
win_idx = jnp.asarray(off[:, None] + np.arange(W)[None, :].astype(np.int32))
def row_then_lane(x2):
    R3 = jnp.take(x2, jnp.clip(blk[:, None] + jnp.arange(3)[None, :],
                               0, R - 1), axis=0)     # (nseg, 3, 128)
    flatr = R3.reshape(R3.shape[0], 384)
    return jnp.take_along_axis(flatr, win_idx, axis=1)
f_rows = jax.jit(row_then_lane)
sync(f_rows(x2))
t_r = timeit(f_rows, x2, k=4)
F1 = np.asarray(f_gather(xj))[..., 0]
F2 = np.asarray(f_rows(x2))
mark(f"row-gather+lane-take: {t_r*1e3:.2f} ms (err={np.abs(F1-F2).max():.1e})")

# component: matmuls only (on a precomputed F)
Fd = jax.device_put(F2)
def mm(Fd):
    outs = []
    for p in range(len(bounds) - 1):
        a, b = bounds[p], bounds[p + 1]
        if a == b: continue
        outs.append(jnp.dot(Fd[a:b], G[p],
                            precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate(outs, axis=0)
f_mm = jax.jit(mm)
sync(f_mm(Fd))
t_m = timeit(f_mm, Fd, k=4)
mark(f"per-phase matmuls: {t_m*1e3:.2f} ms")

# component: output gather
Y = f_mm(Fd)
y1 = Y[:, :Lm].reshape(-1)
f_og = jax.jit(lambda y1: y1[gidx_d])
sync(f_og(y1))
t_o = timeit(f_og, y1, k=4)
mark(f"output element-gather: {t_o*1e3:.2f} ms")
print("DONE")
