# STFT one-big-matmul stage 2 on v5e: welch + spectrogram bench shapes.
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
from dsptpu.kernels.stft import stft_pow_pallas, onesided_bins_from_tile

n, C, nfft, hop = 1_000_000 // 64, 64, 1024, 512
nfr = (n - nfft) // hop + 1
rng = np.random.default_rng(3)
x = rng.standard_normal((n, C)).astype(np.float32)
xj = jax.device_put(x)
win = np.hanning(nfft).astype(np.float32)

# correctness vs numpy on a small slice
xs = np.asarray(x[:6144, :2])
k = (6144 - nfft) // hop + 1
fr = np.stack([xs[b*hop:b*hop+nfft] for b in range(k)])
ref = (np.abs(np.fft.fft(fr * win[None, :, None], axis=1)) ** 2
       ).sum(axis=0).T[:, :nfft//2+1]                     # (C, bins)
tile = stft_pow_pallas(jnp.asarray(xs), win, nfft, hop, k,
                       accumulate=True, onesided=True, TB=64)
got = np.asarray(onesided_bins_from_tile(tile, nfft, nfft//2+1))
err = np.abs(got - ref).max() / ref.max()
mark(f"welch one-sided rel err = {err:.2e}")

for TB in (64, 128, 256):
    f = lambda xc, TB=TB: stft_pow_pallas(xc, win, nfft, hop, nfr,
                                          accumulate=True,
                                          onesided=True, TB=TB)
    sync(f(xj))
    t = timeit(f, xj, k=8, reps=4)
    flops = 2 * 128 * 256 * 2 * 5 * nfr * C   # stage-2 products
    mark(f"welch TB={TB}: {t*1e3:.3f} ms "
         f"({n*C/t/1e9:.1f} GS/s, {flops/t/1e12:.1f} TF/s stage2)")

for TB in (128, 256):
    f = lambda xc, TB=TB: stft_pow_pallas(xc, win, nfft, hop, nfr,
                                          accumulate=False, TB=TB,
                                          raw=True)
    sync(f(xj))
    t = timeit(f, xj, k=8, reps=4)
    mark(f"spectrogram raw TB={TB}: {t*1e3:.3f} ms "
         f"({nfr*C/t/1e6:.2f} M frames/s)")
print("DONE")
