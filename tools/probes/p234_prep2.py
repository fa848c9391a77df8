# (1) skinny (n, 64) -> (64, n) pallas transpose rate
# (2) strided-row manual DMA rate (regroup folded into DMA geometry)
import numpy as np, jax, jax.numpy as jnp, sys
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, C = 1_048_576, 64
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (n, C)).astype(np.float32))

def build_T(TR):
    def kern(x_ref, o_ref):
        o_ref[...] = jnp.swapaxes(x_ref[...], 0, 1)
    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((C, n), jnp.float32),
            grid=(n // TR,),
            in_specs=[pl.BlockSpec((TR, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM))(x)
    return f

for TR in (512, 2048, 8192):
    try:
        f = build_T(TR)
        y = f(x)
        sync(y)
        err = float(jnp.abs(y[3, :100] - x[:100, 3]).max())
        t = timeit(f, x, k=8, reps=4)
        mark(f"skinny T TR={TR}: {t*1e3:.3f} ms "
             f"({2*n*C*4/t/1e9:.0f} GB/s, err={err:.1e})")
    except Exception as e:
        mark(f"skinny T TR={TR}: FAIL {type(e).__name__}: {str(e)[:200]}")

# strided-row DMA: read (pad,128) rows at stride hr from a (C,nrq,hr,128)
# view, 4 planes per step, 1024 steps (the welch DMA pattern)
hr, TB, pad, NST = 4, 128, 136, 1024
nrq = 2184
xT = jnp.zeros((C, nrq, hr, 128), jnp.float32)

def kern2(x4, o_ref, scratch, sem):
    i = pl.program_id(0)
    nb = jnp.int32(16)
    c = i // nb
    b = jax.lax.rem(i, nb)
    for m in range(hr):
        pltpu.make_async_copy(
            x4.at[c, pl.ds(b * TB, pad), m, :],
            scratch.at[m], sem.at[m]).start()
    for m in range(hr):
        pltpu.make_async_copy(
            x4.at[c, pl.ds(b * TB, pad), m, :],
            scratch.at[m], sem.at[m]).wait()
    o_ref[0, :] = scratch[0, 0, :] + scratch[1, 1, :]

@jax.jit
def f2(x4):
    return pl.pallas_call(
        kern2, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        grid=(NST,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((hr, pad, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((hr,))])(x4)
try:
    sync(f2(xT))
    t = timeit(f2, xT, k=8, reps=4)
    byt = NST * hr * pad * 128 * 4
    mark(f"strided-plane DMA: {t*1e3:.3f} ms ({byt/t/1e9:.0f} GB/s)")
except Exception as e:
    mark(f"strided DMA FAIL {type(e).__name__}: {str(e)[:300]}")
print("DONE")
