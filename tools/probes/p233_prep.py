# Time the welch XLA prep (transpose + regroup) at the bench shape.
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")

n, C, nfft, hop, TB = 1_000_000, 64, 1024, 512, 128
N1, hr = nfft // 128, hop // 128
nframes = (n - nfft) // hop + 1
nblocks = -(-nframes // TB)
extra = -(-N1 // hr)
pad = -(-(TB + extra) // 8) * 8
nrq = nblocks * TB + pad
need = nrq * hr * 128
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (n, C)).astype(np.float32))

@jax.jit
def prep(x):
    xT = x.T
    if need > n:
        xT = jnp.pad(xT, ((0, 0), (0, need - n)))
    rows = xT[:, : nrq * hr * 128].reshape(C, nrq, hr, 128)
    return jnp.swapaxes(rows, 1, 2).reshape(C * hr * nrq, 128)

@jax.jit
def prep_T_only(x):
    return x.T.reshape(-1, 128)

@jax.jit
def prep_noT(xT):
    xTp = jnp.pad(xT, ((0, 0), (0, need - n))) if need > n else xT
    rows = xTp[:, : nrq * hr * 128].reshape(C, nrq, hr, 128)
    return jnp.swapaxes(rows, 1, 2).reshape(C * hr * nrq, 128)

sync(prep(x))
t = timeit(prep, x, k=8, reps=4)
mark(f"full prep: {t*1e3:.3f} ms")
sync(prep_T_only(x))
t1 = timeit(prep_T_only, x, k=8, reps=4)
mark(f"x.T only: {t1*1e3:.3f} ms")
xT = x.T
sync(xT)
t2 = timeit(prep_noT, xT, k=8, reps=4)
mark(f"pad+regroup only: {t2*1e3:.3f} ms")
print("DONE")
