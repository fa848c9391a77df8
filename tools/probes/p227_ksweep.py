# Drift-path K sweep: find the select-traffic vs iter-overhead knee.
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
ref = None
for tgt in (96, 48, 24, 12, 6):
    sfm._DRIFT_ITERS = tgt
    sf = sfm.FIRFilter(h, rate)
    def dev(xc):
        sf.reset()
        sf.kernel.phi_accumulator = 0.0
        sf.kernel.input_deficit = 1
        return sf.filt(xc)
    y = dev(xj)
    sync(y)
    if ref is None:
        ref = y
    else:
        mark(f"  err vs first: {float(jnp.abs(ref - y).max()):.2e}")
    k0 = sfm.FIRFilter(h, rate).kernel
    head, _, out_len = k0.plan(n)
    dp = sf.kernel._plan_cache[3]
    t = timeit(dev, xj, k=8, reps=4)
    mark(f"tgt={tgt}: SEG={dp[8]} K={dp[9]} niter={dp[10]} -> "
         f"{t*1e3:.3f} ms ({n/t/1e6:.0f} MS/s)")
print("DONE")
