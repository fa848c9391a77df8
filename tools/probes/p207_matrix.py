# Feature-matrix bisect for the Element-spec Mosaic crash.
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, B, P_in, G = 8, 16, 32, 4
nst = 8
nsuper = nst * S
x3 = jnp.asarray(np.arange(nsuper * P_in * 128, dtype=np.float32)
                 .reshape(nsuper, P_in, 128) % 1000)

def probe(name, grid2, idx, use_when=False, with_tab=False, out4=False):
    def kern(*refs):
        if with_tab:
            band, tabr, o_ref = refs
        else:
            band, o_ref = refs
        def body():
            v = band[:, 3, :]
            if with_tab:
                v = v + tabr[0, 0]
            if out4:
                o_ref[:, 0, 0, :] = v
            else:
                o_ref[:, 0, :] = v
        if use_when:
            g = pl.program_id(0)
            for gi in range(G):
                @pl.when(g == gi)
                def _():
                    body()
        else:
            body()
    grid = (G, nst) if grid2 else (nst,)
    if out4:
        oshape = (nsuper, G, 1, 128)
        ospec = pl.BlockSpec((S, 1, 1, 128),
                             (lambda g, st: (st, g, 0, 0)) if grid2
                             else (lambda st: (st, 0, 0, 0)))
    else:
        oshape = (nsuper, G, 128)
        ospec = pl.BlockSpec((S, 1, 128),
                             (lambda g, st: (st, g, 0)) if grid2
                             else (lambda st: (st, 0, 0)))
    specs = [pl.BlockSpec((pl.Element(S), pl.Element(B), pl.Element(128)),
                          idx, memory_space=pltpu.VMEM)]
    args = [x3]
    if with_tab:
        specs.append(pl.BlockSpec((1024, 128),
                                  (lambda g, st: (g, 0)) if grid2
                                  else (lambda st: (0, 0)),
                                  memory_space=pltpu.VMEM))
        args.append(jnp.zeros((G * 1024, 128), jnp.float32))
    @jax.jit
    def f(*a):
        return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
            oshape, jnp.float32), grid=grid, in_specs=specs,
            out_specs=ospec)(*a)
    try:
        y = f(*args)
        sync(y)
        mark(f"{name}: OK")
    except Exception as e:
        mark(f"{name}: FAIL {type(e).__name__}")

# 1-D grid baselines
probe("M1 1d static8", False, lambda st: (st * S, 8, 0))
probe("M2 1d affine-st", False, lambda st: (st * S, 8 * (st % 2), 0))
probe("M3 1d clip", False, lambda st: (st * S, jnp.clip(8 * st - 8, 0, P_in - B), 0))
# 2-D grid
probe("M4 2d static8", True, lambda g, st: (st * S, 8, 0))
probe("M5 2d affine-g", True, lambda g, st: (st * S, 8 * g % 16, 0))
probe("M6 2d clip-g", True, lambda g, st: (st * S, jnp.clip(8 * g - 8, 0, P_in - B), 0))
# composition features
probe("M7 2d static + when", True, lambda g, st: (st * S, 8, 0), use_when=True)
probe("M8 2d static + tab", True, lambda g, st: (st * S, 8, 0), with_tab=True)
probe("M9 2d static + out4", True, lambda g, st: (st * S, 8, 0), out4=True)
probe("M10 all static", True, lambda g, st: (st * S, 8, 0),
      use_when=True, with_tab=True, out4=True)
print("DONE")
