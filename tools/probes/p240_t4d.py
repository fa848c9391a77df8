# In-kernel 4-D transpose (TRq,1,128,C) -> (C,1,TRq,128) lowering + rate
import numpy as np, jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, C, hr = 1_048_576, 64, 4
nq = n // (hr * 128)          # 2048
TRq = 16
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (n, C)).astype(np.float32))
x5 = x.reshape(nq, hr, 128, C)

def kern(x_ref, o_ref):
    t = x_ref[...]                       # (TRq, 1, 128, C)
    o_ref[...] = jnp.transpose(t, (3, 1, 0, 2))

@jax.jit
def f(x5):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, hr, nq, 128), jnp.float32),
        grid=(hr, nq // TRq),
        in_specs=[pl.BlockSpec((TRq, 1, 128, C),
                               lambda m, i: (i, m, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, 1, TRq, 128),
                               lambda m, i: (0, m, i, 0),
                               memory_space=pltpu.VMEM))(x5)
try:
    y = f(x5)
    sync(y)
    xh = np.asarray(x)
    got = np.asarray(y)
    # q[c, m, r, l] == x[(r*hr+m)*128 + l, c]
    r, m, c = 37, 2, 11
    want = xh[(r * hr + m) * 128:(r * hr + m + 1) * 128, c]
    err = np.abs(got[c, m, r] - want).max()
    t = timeit(f, x5, k=8, reps=4)
    mark(f"4D transpose-regroup: {t*1e3:.3f} ms "
         f"({2*n*C*4/t/1e9:.0f} GB/s, err={err:.1e})")
except Exception as e:
    mark(f"FAIL {type(e).__name__}: {str(e)[:400]}")
print("DONE")
