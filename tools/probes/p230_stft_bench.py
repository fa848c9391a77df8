# New STFT stage-2 at the exact bench config (1M x 64ch) via public API.
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu

n3, nch = 1_000_000, 64
x = np.random.default_rng(0).standard_normal((n3, nch)).astype(np.float32)
xj = jax.device_put(x)
win = np.asarray(dsptpu.windows.hanning(1024)).astype(np.float32)
nfr = (n3 - 1024) // 512 + 1

welch_j = jax.jit(lambda s: dsptpu.power(
    dsptpu.welch_pgram(s, 1024, 512, window=win)))
spec_j = jax.jit(lambda s: dsptpu.power(
    dsptpu.spectrogram(s, 1024, 512, window=win)))
sync(welch_j(xj))
t_w = timeit(welch_j, xj, k=16, reps=4)
mark(f"welch: {t_w*1e3:.3f} ms (r3: 8.66)")
sync(spec_j(xj))
t_s = timeit(spec_j, xj, k=8, reps=4)
mark(f"spectrogram: {t_s*1e3:.3f} ms / {nfr*nch/t_s/1e6:.2f} M frames/s "
     f"(r3: 14.84 / 8.42)")
rate = 2 * n3 * nch / (t_w + t_s)
mark(f"config rate: {rate/1e9:.2f} GS/s (r3: 5.45)")
# correctness vs scipy
import scipy.signal as sp
f_ref, p_ref = sp.welch(x[:65536, :2], axis=0, nperseg=1024, noverlap=512,
                        window=win, detrend=False)
got = np.asarray(welch_j(jnp.asarray(x[:65536, :2])))
rel = np.abs(got - p_ref).max() / p_ref.max()
mark(f"welch vs scipy rel err = {rel:.2e}")
print("DONE")
