# Piecewise: tall transpose alone, kernel alone (prebuilt q), full.
import numpy as np, jax, jax.numpy as jnp, sys, functools
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu
from dsptpu.kernels.transpose import transpose_tall_pallas
from dsptpu.kernels import stft as S

n, C, nfft, hop, TB = 1_000_000, 64, 1024, 512, 128
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (n, C)).astype(np.float32))
win = np.asarray(dsptpu.windows.hanning(1024)).astype(np.float32)
nfr = (n - nfft) // hop + 1
N1, hr = nfft // 128, hop // 128
nblocks = -(-nfr // TB)
extra = -(-N1 // hr)
pad = -(-(TB + extra) // 8) * 8
nrq = nblocks * TB + pad
need = nrq * hr * 128
TRu = hr * 128 * max(1, 8192 // (hr * 128))

f_t = jax.jit(lambda x: transpose_tall_pallas(x, TR=TRu, pad_to=need))
xT = f_t(x)
sync(xT)
t1 = timeit(f_t, x, k=8, reps=4)
mark(f"tall transpose: {t1*1e3:.3f} ms")

# kernel alone, fed the prebuilt padded xT (welch path)
f_k = jax.jit(lambda xT: S._stft_pow_jit.__wrapped__(
    xT.T, jnp.asarray(np.ones((1, N1, 128), np.float32))
    * jnp.asarray(win.reshape(1, N1, 128)), nfft, hop, nfr, True,
    "highest", TB, True, False, False))
# simpler: call stft_pow_pallas on the original x but time the welch
# kernel via the public path minus transpose is hard; instead time
# full public welch and spectrogram for reference
welch_j = jax.jit(lambda s: dsptpu.power(
    dsptpu.welch_pgram(s, 1024, 512, window=win)))
sync(welch_j(x))
t_w = timeit(welch_j, x, k=16, reps=4)
mark(f"welch full: {t_w*1e3:.3f} ms")

# kernel-only estimate: run stft_pow_pallas on a PRE-TRANSPOSED
# single-channel-concatenated signal? Instead: time with C=64 but
# n small enough that transpose is trivial... use the stripped-probe
# result (3.0 ms) as the kernel reference.
# Extra A/B: strided-DMA vs a pre-regrouped contiguous q is the other
# delta; emulate old behavior by timing welch with the interpret-gated
# XLA prep: force on_tpu False via monkeypatch
import dsptpu.kernels.stft as SK
src_flag = {}
orig = SK._stft_pow_jit
mark("done pieces")
print("DONE")
