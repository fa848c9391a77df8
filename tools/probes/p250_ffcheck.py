# filtfilt regression check (bench r4 read 2.87 GS/s vs r3 5.0)
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu, scipy.signal as sp
n = 1_000_000
f = dsptpu.digitalfilter(dsptpu.Lowpass(0.2), dsptpu.Butterworth(8))
x = np.random.default_rng(2).standard_normal(n).astype(np.float32)
xj = jax.device_put(x)
ff = jax.jit(lambda s: dsptpu.filtfilt(f, x=s))
y = ff(xj)
sync(y)
for _ in range(3):
    t = timeit(ff, xj, k=64, reps=5)
    mark(f"filtfilt 1M: {t*1e3:.3f} ms ({n/t/1e9:.2f} GS/s) [r3: 0.200 / 5.0]")
print("DONE")
