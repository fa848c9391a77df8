# Dynamic primitives for the arb-rate kernel:
# (a) Blocked index map reading a scalar-prefetch ref
# (b) in-kernel dynamic contiguous sublane slice pl.ds(traced, N)
# (c) in-kernel dynamic strided slice pl.Slice(traced, N, stride)
# (d) pltpu.roll with traced shift
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512
x2 = jnp.asarray(np.arange(R * 128, dtype=np.float32).reshape(R, 128))
nb = 8
rows = jnp.asarray(np.array([3, 17, 40, 77, 100, 205, 300, 410]) // 8,
                   jnp.int32)   # block indices (8-row units)
offs = jnp.asarray([1, 3, 0, 7, 2, 5, 6, 4], jnp.int32)

def probe(name, kern, extra_specs=(), extra_args=()):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nb,),
        in_specs=[pl.BlockSpec((16, 128),
                               lambda b, r, o: (r[b], 0),
                               memory_space=pltpu.VMEM)] + list(extra_specs),
        out_specs=pl.BlockSpec((8, 128), lambda b, r, o: (b, 0),
                               memory_space=pltpu.VMEM))
    @jax.jit
    def f(rows, offs, x2, *a):
        return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
            (nb * 8, 128), jnp.float32), grid_spec=gs)(rows, offs, x2, *a)
    try:
        y = f(rows, offs, x2, *extra_args)
        sync(y)
        return np.asarray(y)
    except Exception as e:
        mark(f"{name}: FAIL {type(e).__name__}: {str(e)[:250]}")
        return None

# (a)+(b): dynamic block index + dynamic contiguous sublane slice
def kA(r, o, xin, o_ref):
    b = pl.program_id(0)
    off = o[b]
    o_ref[:, :] = xin[pl.ds(off, 8), :]
y = probe("A dynblock+ds", kA)
if y is not None:
    want = np.stack([np.asarray(x2)[int(rows[b])*8 + int(offs[b]):
                                    int(rows[b])*8 + int(offs[b]) + 8]
                     for b in range(nb)]).reshape(nb*8, 128)
    mark(f"A dynblock+ds: OK err={np.abs(y - want).max():.3e}")

# (c): dynamic strided slice
def kC(r, o, xin, o_ref):
    b = pl.program_id(0)
    off = o[b]
    o_ref[:, :] = xin[pl.Slice(off, 8, 2), :]
y = probe("C dyn strided", kC)
if y is not None:
    want = np.stack([np.asarray(x2)[int(rows[b])*8 + int(offs[b]):
                                    int(rows[b])*8 + int(offs[b]) + 16:2]
                     for b in range(nb)]).reshape(nb*8, 128)
    mark(f"C dyn strided: OK err={np.abs(y - want).max():.3e}")

# (d): dynamic roll along lanes
def kD(r, o, xin, o_ref):
    b = pl.program_id(0)
    o_ref[:, :] = pltpu.roll(xin[0:8, :], o[b], axis=1)
y = probe("D dyn roll", kD)
if y is not None:
    want = np.stack([np.roll(np.asarray(x2)[int(rows[b])*8:
                                            int(rows[b])*8+8], int(offs[b]),
                             axis=1) for b in range(nb)]).reshape(nb*8, 128)
    mark(f"D dyn roll: OK err={np.abs(y - want).max():.3e}")
print("DONE")
