# Round-5 de-risk: dynamic Blocked block indices from scalar prefetch,
# STRICTLY in-bounds (the earlier probe's OOB indices faulted and
# wedged the client). Pattern = the arb-rate drift kernel's need:
# per-step input block at a host-planned row offset.
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, BLK, NST = 4096, 64, 32
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (R, 128)).astype(np.float32))
# in-bounds block indices: blk[i]*BLK + BLK <= R
blk = np.minimum(np.cumsum(np.random.default_rng(1).integers(
    0, 3, NST)) + np.arange(NST), R // BLK - 1).astype(np.int32)
blk_j = jnp.asarray(blk)

def kern(bref, xin, o_ref):
    o_ref[...] = xin[...] * 2.0

gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(NST,),
    in_specs=[pl.BlockSpec((BLK, 128), lambda i, b: (b[i], 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BLK, 128), lambda i, b: (i, 0),
                           memory_space=pltpu.VMEM))

@jax.jit
def f(blk_j, x):
    return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
        (NST * BLK, 128), jnp.float32), grid_spec=gs)(blk_j, x)

try:
    y = f(blk_j, x)
    sync(y)
    got = np.asarray(y).reshape(NST, BLK, 128)
    xh = np.asarray(x)
    err = max(float(np.abs(got[i] - 2 * xh[blk[i]*BLK:(blk[i]+1)*BLK]
                           ).max()) for i in range(NST))
    t = timeit(f, blk_j, x, k=16, reps=4)
    mark(f"dyn Blocked in-bounds: OK err={err:.1e} {t*1e3:.3f} ms")
except Exception as e:
    mark(f"dyn Blocked FAIL {type(e).__name__}: {str(e)[:250]}")
print("DONE")
