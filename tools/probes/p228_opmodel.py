# VPU tile-op cost model on v5e: P dependent scaled-adds per grid
# step, three shapes: whole-block ops, sub-sliced register-sized ops,
# and fewer-bigger-block ops. All do the SAME logical work.
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSTEPS, TB, P = 1024, 128, 64

def build(mode, sub=8, fat=4):
    if mode == "whole":
        blk, steps = TB, NSTEPS
        def kern(x_ref, o_ref):
            a = x_ref[:]
            for p in range(P):
                a = a * 1.000001 + x_ref[:]
            o_ref[:] = a
    elif mode == "sub":
        blk, steps = TB, NSTEPS
        def kern(x_ref, o_ref):
            for s in range(TB // sub):
                a = x_ref[s * sub:(s + 1) * sub, :]
                for p in range(P):
                    a = a * 1.000001 + x_ref[s * sub:(s + 1) * sub, :]
                o_ref[s * sub:(s + 1) * sub, :] = a
    elif mode == "fat":
        blk, steps = TB * fat, NSTEPS // fat
        def kern(x_ref, o_ref):
            a = x_ref[:]
            for p in range(P):
                a = a * 1.000001 + x_ref[:]
            o_ref[:] = a
    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((NSTEPS * TB, 128),
                                                 jnp.float32),
            grid=(steps,),
            in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))(x)
    return f

x = jnp.ones((NSTEPS * TB, 128), jnp.float32)
for name, f in (("whole TB=128", build("whole")),
                ("sub8", build("sub", sub=8)),
                ("sub16", build("sub", sub=16)),
                ("sub32", build("sub", sub=32)),
                ("fat x4 (TB=512)", build("fat", fat=4)),
                ("fat x8 (TB=1024)", build("fat", fat=8))):
    try:
        sync(f(x))
        t = timeit(f, x, k=8, reps=4)
        work = NSTEPS * TB * 128 * 4 * P * 3
        mark(f"{name}: {t*1e3:.3f} ms ({work/t/1e12:.2f} TB/s eff)")
    except Exception as e:
        mark(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}")
print("DONE")
