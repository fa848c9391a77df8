# Isolate: index expression forms x kernel body, all with legal 4-D out.
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, B, P_in, G = 8, 16, 32, 4
nst = 8
nsuper = nst * S
rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.standard_normal((nsuper, P_in, 128)), jnp.float32)
tab = jnp.asarray(rng.standard_normal((G * 1024, 128)), jnp.float32)

def probe(name, idx, body_kind):
    def kern(band, tabr, o_ref):
        if body_kind == "copy":
            o_ref[:, 0, 0, :] = band[:, 3, :]
        elif body_kind == "dot":
            T = tabr[0:128, :]
            o_ref[:, 0, 0, :] = jnp.dot(band[:, 3, :], T,
                                        preferred_element_type=jnp.float32)
        elif body_kind == "dot_multi":
            acc = None
            for d in range(4):
                T = tabr[d*128:(d+1)*128, :]
                p = jnp.dot(band[:, 2+d, :], T,
                            preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            o_ref[:, 0, 0, :] = acc
    @jax.jit
    def f(x3, tab):
        return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
            (nsuper, G, 1, 128), jnp.float32), grid=(G, nst),
            in_specs=[
                pl.BlockSpec((pl.Element(S), pl.Element(B),
                              pl.Element(128)), idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1024, 128), lambda g, st: (g, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((S, 1, 1, 128),
                                   lambda g, st: (st, g, 0, 0)))(x3, tab)
    try:
        y = f(x3, tab)
        sync(y)
        mark(f"{name}: OK")
        return np.asarray(y)
    except Exception as e:
        mark(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}")
        return None

idx_static = lambda g, st: (st * S, 8, 0)
idx_lin = lambda g, st: (st * S, 8 * g, 0)            # pure affine in g
idx_mod = lambda g, st: (st * S, 8 * g % 16, 0)
idx_clip = lambda g, st: (st * S, jnp.clip(8 * g - 8, 0, P_in - B), 0)
def idx_chain(g, st):
    off = jnp.int32(8)
    off = jnp.where(g == 0, 0, off)
    return (st * S, off, 0)

probe("I1 static copy", idx_static, "copy")
probe("I2 lin copy", idx_lin, "copy")
probe("I3 mod copy", idx_mod, "copy")
probe("I4 clip copy", idx_clip, "copy")
probe("I5 chain copy", idx_chain, "copy")
probe("I6 static dot", idx_static, "dot")
probe("I7 static dot_multi", idx_static, "dot_multi")
y = probe("I8 clip dot_multi", idx_clip, "dot_multi")
if y is not None:
    xh = np.asarray(x3); th = np.asarray(tab)
    ref = np.zeros((nst, S, 128), np.float32)
    # check one group: g fixed per block row; verify g=2 blocks
    # (offset clip(8*2-8)=8): out[st, s, g=2] rows
    for st in range(nst):
        acc = np.zeros((S, 128), np.float32)
        for d in range(4):
            acc += xh[st*S:(st+1)*S, 8+2+d, :] @ th[2*1024+d*128:2*1024+(d+1)*128]
        ref[st] = acc
    got = np.asarray(y).reshape(nsuper, G, 128)[:, 2, :].reshape(nst, S, 128)
    mark(f"I8 g=2 err={float(np.abs(got-ref).max()):.3e}")
print("DONE")
