# Component breakdown of the welch kernel structure: stripped kernel
# replicating DMA + stage1 + twiddle + concat + matmul + reduce with
# stage toggles. Bench geometry: N1=8, hr=4, TB=128, 1024 steps.
import numpy as np, jax, jax.numpy as jnp, functools, sys
sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dsptpu.kernels.stft import _tables, _stage1_fft

N1, hr, TB, NSTEPS = 8, 4, 128, 1024
rows = N1 // 2 + 1
pad = -(-(TB + 2) // 8) * 8
nrq = NSTEPS * TB + pad
w1re, w1im, twre, twim, w2re, w2im, _ = _tables(1024, N1, None)
w2cat = jnp.asarray(np.concatenate([w2re, w2im], 1))
twt = jnp.asarray(np.stack([twre, twim]))
wpj = jnp.asarray(np.random.default_rng(0).standard_normal(
    (1, N1, 128)).astype(np.float32))
q = jnp.asarray(np.random.default_rng(1).standard_normal(
    (hr * nrq, 128)).astype(np.float32))

def build(do_s1, do_tw, do_mm):
    def kern(q_hbm, w2c, tw, wp, o_ref, scratch, sem):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + 1, jnp.int32(2))
        def start(step, buf):
            for m in range(hr):
                pltpu.make_async_copy(
                    q_hbm.at[pl.ds(m * nrq + step * TB, pad), :],
                    scratch.at[buf, m], sem.at[buf, m]).start()
        @pl.when(i == 0)
        def _():
            start(i, slot)
        @pl.when(i + 1 < NSTEPS)
        def _():
            start(i + 1, nxt)
        for m in range(hr):
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(m * nrq + i * TB, pad), :],
                scratch.at[slot, m], sem.at[slot, m]).wait()
        planes = [scratch[slot, j1 % hr, j1 // hr: j1 // hr + TB, :]
                  * wp[0, j1, :][None, :] for j1 in range(N1)]
        if do_s1:
            fr = _stage1_fft(planes, N1)
            cache = {}
            cre, cim = [], []
            for k1 in range(rows):
                r, im = fr[k1]
                z = lambda: jnp.zeros((TB, 128), jnp.float32)
                bre = r if r is not None else z()
                bim = im if im is not None else z()
                if do_tw:
                    tre = tw[0, k1, :][None, :]
                    tim = tw[1, k1, :][None, :]
                    cre.append(bre * tre - bim * tim)
                    cim.append(bre * tim + bim * tre)
                else:
                    cre.append(bre)
                    cim.append(bim)
        else:
            cre = [planes[k1] for k1 in range(rows)]
            cim = [planes[k1] for k1 in range(rows)]
        if do_mm:
            L = jnp.concatenate(cre + cim, axis=0)
            OUT = jnp.dot(L, w2c[:, :],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            acc = None
            for k1 in range(rows):
                a = OUT[k1 * TB:(k1 + 1) * TB, :]
                bq = OUT[(rows + k1) * TB:(rows + k1 + 1) * TB, :]
                dre = a[:, :128] - bq[:, 128:]
                dim = a[:, 128:] + bq[:, :128]
                pw = dre * dre + dim * dim
                acc = pw if acc is None else acc + pw
        else:
            acc = None
            for c2, s2 in zip(cre, cim):
                pw = c2 * c2 + s2 * s2
                acc = pw if acc is None else acc + pw
        row = jnp.sum(acc, axis=0, keepdims=True)
        @pl.when(i == 0)
        def _():
            o_ref[0, :] = row[0]
        @pl.when(i > 0)
        def _():
            o_ref[0, :] = o_ref[0, :] + row[0]
    @jax.jit
    def f(q):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            grid=(NSTEPS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec((128, 256), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, N1, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, N1, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, hr, pad, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, hr))])(
                q, w2cat, twt, wpj)
    return f

for name, s1, tw_, mm in (("full (s1+tw+mm)", 1, 1, 1),
                          ("no-matmul", 1, 1, 0),
                          ("no-stage1 (mm only)", 0, 0, 1),
                          ("dma+window only", 0, 0, 0)):
    try:
        f = build(s1, tw_, mm)
        sync(f(q))
        t = timeit(f, q, k=8, reps=4)
        mark(f"{name}: {t*1e3:.3f} ms ({t/NSTEPS*1e6:.2f} us/step)")
    except Exception as e:
        mark(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
print("DONE")
