# Raw pallas matmul rates at the STFT stage-2 shape: HIGHEST vs
# DEFAULT vs manual 3-pass bf16 split (HIGH semantics).
import numpy as np, jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N, STEPS = 1280, 128, 256, 512

def build(mode):
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        if mode == "highest":
            o_ref[:] = jnp.dot(a, b, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        elif mode == "default":
            o_ref[:] = jnp.dot(a, b, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
        elif mode == "bf16x3":
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
            o_ref[:] = d(ah, bh) + (d(ah, bl) + d(al, bh))
    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((STEPS * M, N),
                                                 jnp.float32),
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((M, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))(a, b)
    return f

rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((STEPS * M, K)), jnp.float32)
b = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
ref = None
for mode in ("highest", "bf16x3", "default"):
    f = build(mode)
    y = f(a, b)
    sync(y)
    if ref is None:
        ref = y
    else:
        scale = float(jnp.abs(ref).max())
        err = float(jnp.abs(y - ref).max()) / scale
        mark(f"  {mode} rel err vs highest: {err:.2e}")
    t = timeit(f, a, b, k=8, reps=4)
    fl = 2.0 * STEPS * M * K * N
    mark(f"{mode}: {t*1e3:.3f} ms = {fl/t/1e12:.1f} TF/s")
print("DONE")
