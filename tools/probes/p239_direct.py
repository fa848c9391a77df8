import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu
from dsptpu.kernels.stft import stft_pow_pallas
from dsptpu.kernels.transpose import transpose_tall_pallas

n, C = 1_000_000, 64
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (n, C)).astype(np.float32))
win = np.asarray(dsptpu.windows.hanning(1024)).astype(np.float32)
nfr = (n - 1024) // 512 + 1
f = jax.jit(lambda s: stft_pow_pallas(s, win, 1024, 512, nfr,
                                      accumulate=True, onesided=True))
sync(f(x))
t = timeit(f, x, k=16, reps=4)
mark(f"stft_pow_pallas accum: {t*1e3:.3f} ms")
ft = jax.jit(lambda s: transpose_tall_pallas(s, TR=8192,
                                             pad_to=1118208))
sync(ft(x))
t2 = timeit(ft, x, k=16, reps=4)
mark(f"transpose alone: {t2*1e3:.3f} ms")
print("DONE")
