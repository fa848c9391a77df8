# Element padding semantics: do partially-OOB element windows fault?
# Are in-bounds rows of a partially-OOB block read correctly?
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, B, P_in = 8, 16, 32
nst = 8
nsuper = nst * S
rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.standard_normal((nsuper, P_in, 128)), jnp.float32)

# P1: dim-1 window with negative start (pad_low=8), read row `rel`
# such that the absolute row = start + rel is in-bounds.
def probe_dim1(name, start_expr, pad, rel):
    def kern(band, o_ref):
        o_ref[:, 0, 0, :] = band[:, rel, :]
    @jax.jit
    def f(x3):
        return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
            (nsuper, 1, 1, 128), jnp.float32), grid=(1, nst),
            in_specs=[pl.BlockSpec(
                (pl.Element(S), pl.Element(B, padding=pad),
                 pl.Element(128)),
                lambda g, st: (st * S, start_expr, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((S, 1, 1, 128),
                                   lambda g, st: (st, 0, 0, 0)))(x3)
    try:
        y = f(x3)
        sync(y)
        got = np.asarray(y)[:, 0, 0, :]
        want = np.asarray(x3)[:, start_expr + rel, :]
        mark(f"{name}: OK err={float(np.abs(got-want).max()):.3e}")
    except Exception as e:
        mark(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")

probe_dim1("P1a neg-start pad(8,0)", -8, (8, 0), 10)   # abs row 2
probe_dim1("P1b high-end pad(0,8)", 24, (0, 8), 4)     # abs row 28, block [24,40)
probe_dim1("P1c both pads", -8, (8, 8), 12)            # abs row 4

# P2: dim-0 OOB (head/tail super views): block supers [st*S-1, st*S+S-1)
# with pad on dim0; read super index s, check rows for s>=1 at st=0
# (s=0 reads the pad => masked in real kernel; here just check s>=1).
def probe_dim0(name, shift, pad0):
    def kern(band, o_ref):
        o_ref[:, 0, 0, :] = band[:, 3, :]
    @jax.jit
    def f(x3):
        return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
            (nsuper, 1, 1, 128), jnp.float32), grid=(1, nst),
            in_specs=[pl.BlockSpec(
                (pl.Element(S, padding=pad0), pl.Element(B),
                 pl.Element(128)),
                lambda g, st: (st * S + shift, 8, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((S, 1, 1, 128),
                                   lambda g, st: (st, 0, 0, 0)))(x3)
    try:
        y = f(x3)
        sync(y)
        got = np.asarray(y).reshape(nst, S, 128)
        xh = np.asarray(x3).reshape(nst, S, P_in, 128)
        errs = []
        for st in range(nst):
            for s in range(S):
                idx = st * S + shift + s
                if 0 <= idx < nsuper:
                    want = np.asarray(x3)[idx, 8 + 3, :]
                    errs.append(float(np.abs(got[st, s] - want).max()))
        mark(f"{name}: OK inbounds-err={max(errs):.3e} ({len(errs)} checked)")
    except Exception as e:
        mark(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")

probe_dim0("P2a tail shift=-1 pad(1,0)", -1, (1, 0))
probe_dim0("P2b head shift=+1 pad(0,1)", +1, (0, 1))
print("DONE")
