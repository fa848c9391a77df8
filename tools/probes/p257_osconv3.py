import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu, scipy.signal as sp
nch, n2 = 16, 10_000_000
h2 = sp.firwin(4096, 0.1).astype(np.float32)
x2 = np.random.default_rng(0).standard_normal((n2, nch)).astype(np.float32)
x2j, h2j = jax.device_put(x2), jnp.asarray(h2)
osf = jax.jit(lambda b, s: dsptpu.fftfilt(b, s))
y = osf(h2j, x2j)
sync(y)
ref = sp.oaconvolve(x2[:40000, :2], h2[:, None], axes=0)[:40000-4096]
err = float(jnp.abs(y[:40000-4096, :2] - jnp.asarray(ref)).max())
mark(f"err vs scipy: {err:.2e}")
for _ in range(3):
    t = timeit(osf, h2j, x2j, k=4, reps=5)
    mark(f"os 4096tap 16ch: {t*1e3:.3f} ms ({n2*nch/t/1e9:.2f} GS/s) "
         f"[r4-pre: 25.2 / 6.34]")
print("DONE")
