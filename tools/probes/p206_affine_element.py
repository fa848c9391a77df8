# Full mini-kernel with affine clamped Element offsets (no prefetch),
# pl.when branches + matmuls + 4-D out; plus a where-chain index probe.
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, B, P_in, G, C, D = 8, 16, 32, 4, 8, 2
O_r = G * C
nst = 8
nsuper = nst * S
rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.standard_normal((nsuper, P_in, 128)), jnp.float32)
r_lo = [(c * (P_in - D - B // 2)) // O_r for c in range(O_r)]
# affine fit blo(g) = clip(a*g + b, 0, P_in - B), multiples of 8
a_f, b_f = 8, -8
blo = [min(max(a_f * g + b_f, 0), P_in - B) for g in range(G)]
for g in range(G):
    for i in range(C):
        assert blo[g] <= r_lo[g*C+i] and r_lo[g*C+i] + D <= blo[g] + B, \
            (g, i, blo[g], r_lo[g*C+i])
grp_rows = C * D * 128
tab = jnp.asarray(rng.standard_normal((G * grp_rows, 128)), jnp.float32)

def kern(band, tabr, o_ref):
    g = pl.program_id(0)
    for gi in range(G):
        @pl.when(g == gi)
        def _():
            for ci in range(C):
                c = gi * C + ci
                rel = r_lo[c] - blo[gi]
                acc = None
                for d in range(D):
                    T = tabr[(ci*D+d)*128:(ci*D+d+1)*128, :]
                    part = jnp.dot(band[:, rel + d, :], T,
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
                o_ref[:, 0, ci, :] = acc

def mk(idx):
    @jax.jit
    def run(x3, tab):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nsuper, G, C, 128),
                                           jnp.float32),
            grid=(G, nst),
            in_specs=[
                pl.BlockSpec((pl.Element(S), pl.Element(B),
                              pl.Element(128)), idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp_rows, 128), lambda g, st: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, 1, C, 128),
                                   lambda g, st: (st, g, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x3, tab)
    return run

def ref_out():
    xh = np.asarray(x3); th = np.asarray(tab)
    ref = np.zeros((nsuper, O_r, 128), np.float32)
    for c in range(O_r):
        gi, ci = c // C, c % C
        for d in range(D):
            T = th[gi*grp_rows+(ci*D+d)*128: gi*grp_rows+(ci*D+d+1)*128]
            ref[:, c, :] += xh[:, r_lo[c] + d, :] @ T
    return ref

try:
    run = mk(lambda g, st: (st * S, jnp.clip(a_f * g + b_f, 0, P_in - B), 0))
    y = run(x3, tab)
    sync(y)
    err = float(np.abs(np.asarray(y).reshape(nsuper, O_r, 128)
                       - ref_out()).max())
    mark(f"AFFINE FULL err={err:.3e}")
except Exception as e:
    mark(f"AFFINE FULL FAIL {type(e).__name__}: {str(e)[:400]}")

def chain_idx(g, st):
    off = jnp.int32(blo[G - 1])
    for gi in range(G - 2, -1, -1):
        off = jnp.where(g == gi, blo[gi], off)
    return (st * S, off, 0)

try:
    y2 = mk(chain_idx)(x3, tab)
    sync(y2)
    err2 = float(np.abs(np.asarray(y2).reshape(nsuper, O_r, 128)
                        - ref_out()).max())
    mark(f"WHERE-CHAIN err={err2:.3e}")
except Exception as e:
    mark(f"WHERE-CHAIN FAIL {type(e).__name__}: {str(e)[:300]}")
print("DONE")
