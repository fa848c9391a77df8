# A/B the REAL stft kernel: strided-row DMA (new) vs contiguous-plane
# DMA (old regrouped layout), kernel-only timing at the bench shape.
import numpy as np, jax, jax.numpy as jnp, sys, functools
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
import dsptpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dsptpu.kernels import stft as S

n, C, nfft, hop, TB = 1_000_000, 64, 1024, 512, 128
N1, hr = nfft // 128, hop // 128
win = np.asarray(dsptpu.windows.hanning(nfft)).astype(np.float32)
nfr = (n - nfft) // hop + 1
nblocks = -(-nfr // TB)
valid_last = nfr - (nblocks - 1) * TB
extra = -(-N1 // hr)
pad = -(-(TB + extra) // 8) * 8
nrq = nblocks * TB + pad
need = nrq * hr * 128
rows = N1 // 2 + 1
w1re, w1im, twre, twim, w2re, w2im, _ = S._tables(nfft, N1, None)
w2cat = jnp.asarray(np.concatenate([w2re, w2im], 1))
twt = jnp.asarray(np.stack([twre, twim]))
wpj = jnp.asarray(win.reshape(1, N1, 128))
xT = jnp.asarray(np.random.default_rng(0).standard_normal(
    (C, need)).astype(np.float32))
x4 = xT.reshape(C, nrq, hr, 128)                  # strided layout
x4c = jnp.swapaxes(x4, 1, 2)                      # (C, hr, nrq, 128)
x4c = jax.device_put(np.asarray(x4c))             # materialized

kern_new = functools.partial(
    S._kernel, w1re=w1re, w1im=w1im, TB=TB, N1=N1, rows=rows, hr=hr,
    pad=pad, nblocks=nblocks, prec=jax.lax.Precision.HIGHEST,
    accum=True, valid_last=valid_last)

def kern_contig(q_hbm, w2c, tw, wp, o_ref, scratch, sem):
    # identical pipeline but DMA from the regrouped (C, hr, nrq, 128)
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    nb32 = jnp.int32(nblocks)
    slot = jax.lax.rem(i, jnp.int32(2))
    nxt = jax.lax.rem(i + 1, jnp.int32(2))
    def start(step, buf):
        cs = step // nb32
        bs = jax.lax.rem(step, nb32)
        for m in range(hr):
            pltpu.make_async_copy(
                q_hbm.at[cs, m, pl.ds(bs * TB, pad), :],
                scratch.at[buf, m], sem.at[buf, m]).start()
    @pl.when(i == 0)
    def _():
        start(i, slot)
    @pl.when(i + 1 < nsteps)
    def _():
        start(i + 1, nxt)
    c = i // nb32
    b = jax.lax.rem(i, nb32)
    for m in range(hr):
        pltpu.make_async_copy(
            q_hbm.at[c, m, pl.ds(b * TB, pad), :],
            scratch.at[slot, m], sem.at[slot, m]).wait()
    # inline the rest by calling the module kernel body? Not separable;
    # replicate minimal compute: window+stage1+twiddle+matmul+reduce
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    raw = [scratch[slot, j1 % hr, j1 // hr: j1 // hr + TB, :]
           for j1 in range(N1)]
    planes = [raw[j1] * wp[0, j1, :][None, :] for j1 in range(N1)]
    fr = S._stage1_fft(planes, N1)
    cre, cim = [], []
    for k1 in range(rows):
        r, im_ = fr[k1]
        z = lambda: jnp.zeros((TB, 128), jnp.float32)
        bre = r if r is not None else z()
        bim = im_ if im_ is not None else z()
        tre = tw[0, k1, :][None, :]
        tim = tw[1, k1, :][None, :]
        cre.append(bre * tre - bim * tim)
        cim.append(bre * tim + bim * tre)
    L = jnp.concatenate(cre + cim, axis=0)
    OUT = dot(L, w2c[:, :])
    fid = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 0)
    keep = jnp.where((b < nblocks - 1) | (fid < valid_last), 1.0, 0.0)
    for k1 in range(rows):
        a = OUT[k1 * TB:(k1 + 1) * TB, :]
        bq = OUT[(rows + k1) * TB:(rows + k1 + 1) * TB, :]
        dre = a[:, :128] - bq[:, 128:]
        dim = a[:, 128:] + bq[:, :128]
        pw = (dre * dre + dim * dim) * keep
        row = jnp.sum(pw, axis=0, keepdims=True)
        @pl.when(b == 0)
        def _(row=row, k1=k1):
            o_ref[0, 0, k1, :] = row[0]
        @pl.when(b > 0)
        def _(row=row, k1=k1):
            o_ref[0, 0, k1, :] = o_ref[0, 0, k1, :] + row[0]

def run(kern, q):
    @jax.jit
    def f(q):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, 1, rows, 128),
                                           jnp.float32),
            grid=(C * nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec((128, 256), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, N1, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, N1, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, rows, 128),
                                   lambda i: (i // nblocks, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, hr, pad, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, hr))])(
                q, w2cat, twt, wpj)
    return f

f_new = run(kern_new, x4)
y1 = f_new(x4)
sync(y1)
t_new = timeit(f_new, x4, k=8, reps=4)
mark(f"REAL kernel, strided DMA: {t_new*1e3:.3f} ms")
f_old = run(kern_contig, x4c)
y2 = f_old(x4c)
sync(y2)
err = float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max())
t_old = timeit(f_old, x4c, k=8, reps=4)
mark(f"same kernel, contiguous DMA: {t_old*1e3:.3f} ms (rel err {err:.1e})")
print("DONE")
