# Drift-scan arb-rate path on real TPU: bench config (0.9997 x 10M).
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu
from dsptpu.filters import stream_filt as sfm

rate = 0.9997
h = np.asarray(dsptpu.resample_filter(rate, 32)).astype(np.float32)
n = 10_000_000
x = np.random.default_rng(5).standard_normal(n).astype(np.float32)
xj = jax.device_put(x)
sf = sfm.FIRFilter(h, rate)
def dev(xc):
    sf.reset()
    sf.kernel.phi_accumulator = 0.0
    sf.kernel.input_deficit = 1
    return sf.filt(xc)
y = dev(xj)
sync(y)
# correctness vs all-phase on a 200k prefix
n2 = 200_000
sf2 = sfm.FIRFilter(h, rate)
k2 = sf2.kernel
head, alpha, out_len2 = k2.plan(n2)
xc = jnp.concatenate([jnp.zeros(sf2.history_len, jnp.float32), xj[:n2]])
end0 = sf2.history_len + head[0] - 1
want = sfm._pfb_dot_arb(xc, k2.pfb_t, k2.dpfb_t,
                        jnp.asarray(end0.astype(np.int32)),
                        jnp.asarray(head[1].astype(np.int32)),
                        jnp.asarray(alpha, jnp.float32), k2.taps_per_phi)
err = float(jnp.abs(y[:out_len2 - 100] - want[:out_len2 - 100]).max())
mark(f"drift vs all-phase err = {err:.3e}")
t = timeit(dev, xj, k=8, reps=4)
mark(f"arb 0.9997 x 10M: {t*1e3:.3f} ms ({n/t/1e6:.0f} MS/s)")
t2 = timeit(dev, xj, k=8, reps=4)
mark(f"repeat: {t2*1e3:.3f} ms ({n/t2/1e6:.0f} MS/s)")
print("DONE")
