# Round-5 de-risk for the arb-rate drift kernel (DESIGN.md cand. 1):
#  P1  in-kernel dynamic row slice of a VMEM ref at ARBITRARY offset
#  P1b same at 8-multiple offsets only
#  P2  pltpu.roll with a TRACED (dynamic) non-negative lane shift
#  P2b pltpu.roll with a traced sublane (axis 0) shift
#  P3  two-ref dynamic-Blocked fetch -> VMEM scratch concat -> dyn slice
# All indices strictly in bounds (deep-OOB wedges the client, r4 notes).
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
R = 512
xh = rng.standard_normal((R, 128)).astype(np.float32)
x = jnp.asarray(xh)
NST, OUT_R = 4, 32
offs_any = np.array([3, 11, 26, 40], np.int32)     # arbitrary rows
offs_8 = np.array([0, 8, 24, 48], np.int32)
shifts = np.array([8, 24, 48, 112], np.int32)      # lane shifts (mult 8)
rshifts = np.array([1, 3, 5, 7], np.int32)         # sublane shifts

def run(tag, fn, ref):
    try:
        y = fn()
        sync(y)
        err = float(np.abs(np.asarray(y) - ref).max())
        mark(f"{tag}: OK err={err:.1e}")
    except Exception as e:
        mark(f"{tag}: FAIL {type(e).__name__}: {str(e)[:200]}")

# ---- P1/P1b: dynamic row slice at prefetched offset --------------------
def make_slice(offs):
    def kern(o_s, xref, oref):
        i = pl.program_id(0)
        oref[...] = xref[pl.ds(o_s[i], OUT_R), :]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NST,),
        in_specs=[pl.BlockSpec((R, 128), lambda i, o: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((OUT_R, 128), lambda i, o: (i, 0),
                               memory_space=pltpu.VMEM))
    return jax.jit(lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((NST * OUT_R, 128),
                                             jnp.float32),
        grid_spec=gs)(jnp.asarray(offs), x))

ref_any = np.concatenate([xh[o:o + OUT_R] for o in offs_any])
ref_8 = np.concatenate([xh[o:o + OUT_R] for o in offs_8])
run("P1 dynslice any-off", make_slice(offs_any), ref_any)
run("P1b dynslice 8-off", make_slice(offs_8), ref_8)

# ---- P2: dynamic lane roll ---------------------------------------------
def make_roll(axis, sh_arr):
    def kern(s_s, xref, oref):
        i = pl.program_id(0)
        oref[...] = pltpu.roll(xref[...], s_s[i], axis=axis)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NST,),
        in_specs=[pl.BlockSpec((OUT_R, 128), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((OUT_R, 128), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM))
    return jax.jit(lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((NST * OUT_R, 128),
                                             jnp.float32),
        grid_spec=gs)(jnp.asarray(sh_arr), x[:NST * OUT_R]))

ref_l = np.concatenate([np.roll(xh[i * OUT_R:(i + 1) * OUT_R], s, axis=1)
                        for i, s in enumerate(shifts)])
ref_r = np.concatenate([np.roll(xh[i * OUT_R:(i + 1) * OUT_R], s, axis=0)
                        for i, s in enumerate(rshifts)])
run("P2 dyn lane roll", make_roll(1, shifts), ref_l)
run("P2b dyn sublane roll", make_roll(0, rshifts), ref_r)

# ---- P3: two dynamic-Blocked refs -> scratch concat -> dyn slice -------
BLK = 64
qa = np.array([0, 1, 3, 5], np.int32)          # in-bounds: qa+1 <= R/BLK-1
fo = np.array([3, 17, 40, 63], np.int32)       # frame offset in rows
def kern3(q_s, f_s, xa, xb, oref, scr):
    i = pl.program_id(0)
    scr[pl.ds(0, BLK), :] = xa[...]
    scr[pl.ds(BLK, BLK), :] = xb[...]
    oref[...] = scr[pl.ds(f_s[i], OUT_R), :]
gs3 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(NST,),
    in_specs=[pl.BlockSpec((BLK, 128), lambda i, q, f: (q[i], 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((BLK, 128), lambda i, q, f: (q[i] + 1, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((OUT_R, 128), lambda i, q, f: (i, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((2 * BLK, 128), jnp.float32)])
f3 = jax.jit(lambda: pl.pallas_call(
    kern3, out_shape=jax.ShapeDtypeStruct((NST * OUT_R, 128),
                                          jnp.float32),
    grid_spec=gs3)(jnp.asarray(qa), jnp.asarray(fo), x, x))
ref3 = np.concatenate([xh[q * BLK + f: q * BLK + f + OUT_R]
                       for q, f in zip(qa, fo)])
run("P3 2ref+scratch+dynslice", f3, ref3)
print("DONE p264")
