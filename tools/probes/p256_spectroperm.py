# Pallas spectrogram epilogue: tile (C,nb,N1,TB,128) -> (Npad, nb*TB, C)
# with bins k1+N1*k2; per-(b,k1) blocks, in-kernel (C,TB,128)->(128,TB,C).
import numpy as np, jax, jax.numpy as jnp, functools, sys
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, nb, N1, TB = 64, 8, 8, 256
l2 = 65
tile = jnp.asarray(np.random.default_rng(0).standard_normal(
    (C, nb, N1, TB, 128)).astype(np.float32))

def kern(t_ref, o_ref):
    t = t_ref[:, 0, 0, :, :]                     # (C, TB, 128)
    p = jnp.transpose(t, (2, 1, 0))              # (128, TB, C)
    o_ref[:, 0, :, :] = p[:l2]

@jax.jit
def f(tile):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((l2, N1, nb * TB, C), jnp.float32),
        grid=(nb, N1),
        in_specs=[pl.BlockSpec((C, 1, 1, TB, 128),
                               lambda b, k1: (0, b, k1, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((l2, 1, TB, C),
                               lambda b, k1: (0, k1, b, 0),
                               memory_space=pltpu.VMEM))(tile)

try:
    y = f(tile)
    sync(y)
    got = np.asarray(y)                          # (l2, N1, nb*TB, C)
    th = np.asarray(tile)
    # got[k2, k1, b*TB+f, c] == tile[c, b, k1, f, k2]
    ok = np.allclose(got[13, 3, 2 * TB + 7, 11], th[11, 2, 3, 7, 13])
    err = abs(got[13, 3, 2 * TB + 7, 11] - th[11, 2, 3, 7, 13])
    t = timeit(f, tile, k=8, reps=5)
    mark(f"spectro-perm kernel: {t*1e3:.3f} ms (spot err {err:.1e})")
    # full check on a slice
    want = th[:, 1, 4, :, :l2]                   # (C, TB, l2)
    g2 = got[:, 4, 1 * TB:(1 + 1) * TB, :]       # (l2, TB, C)
    mark(f"block err: {np.abs(g2 - want.transpose(2, 1, 0)).max():.1e}")
except Exception as e:
    mark(f"FAIL {type(e).__name__}: {str(e)[:300]}")
print("DONE")
