# FIR v3 (wide-matmul + scratch carry) at the bench config.
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu
import scipy.signal as sp

n = 10_000_000
h = sp.firwin(127, 0.25).astype(np.float32)
x = (np.sin(2*np.pi*0.01*np.arange(n)) +
     0.1*np.random.default_rng(0).standard_normal(n)).astype(np.float32)
xj, hj = jax.device_put(x), jnp.asarray(h)
fir = jax.jit(lambda b, s: dsptpu.filt(b, s))
y = fir(hj, xj)
sync(y)
ref = sp.lfilter(h, [1.0], x[:100000])
err = float(jnp.abs(y[:100000] - jnp.asarray(ref)).max())
mark(f"err vs lfilter: {err:.2e}")
for A in (512, 1024, 2048):
    from dsptpu.kernels.fir import fir_pallas
    f = jax.jit(lambda s, A=A: fir_pallas(s, hj, A=A))
    sync(f(xj))
    t = timeit(f, xj, k=16, reps=4)
    fl = 2.0 * n * 256
    mark(f"A={A}: {t*1e3:.3f} ms ({n/t/1e9:.1f} GS/s, "
         f"{fl/t/1e12:.1f} TF/s issued) [r3: 0.202 ms / 49.5 GS/s]")
print("DONE")
