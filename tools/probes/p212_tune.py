# pfb2 grouped: correct-phase exactness, S sweep, dimension_semantics,
# and a contiguous-load timing bound.
import numpy as np, jax, jax.numpy as jnp, importlib, sys, functools
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
from fractions import Fraction
import dsptpu
from dsptpu.filters import stream_filt as sfm
from dsptpu.kernels import pfb2 as K2
import dsptpu.ops.dspbase as db
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ratio = Fraction(147, 160)
h = np.asarray(dsptpu.resample_filter(ratio)).astype(np.float32)
pfb = sfm.taps2pfb(h, 147)
n = 10_000_000
rng = np.random.default_rng(7)
x = rng.standard_normal(n).astype(np.float32)
xj = jax.device_put(x)

k0 = sfm.FIRFilter(h, ratio).kernel     # fresh: phi=initial
phi0, dfc = k0.phi_idx, k0.input_deficit
out_len = k0.output_length(n)
plan = K2.pfb2_plan(pfb, 147, 160, int(phi0), int(dfc))
mark(f"plan G={plan.G} Cg={plan.Cg} grp={plan.grp_stride} phi0={phi0} dfc={dfc} out={out_len}")

db._PALLAS_OS = False
fx = sfm.FIRFilter(h, ratio)
def xla_path(xc):
    fx.reset()
    return fx.filt(xc)
ref = xla_path(xj)
t_xla = timeit(xla_path, xj, k=16)
mark(f"XLA: {t_xla*1e3:.3f} ms")
db._PALLAS_OS = True

y = K2.pfb2_resample_pallas(xj, pfb, 147, 160, phi0, dfc, out_len, S=32)
sync(y)
err = float(jnp.abs(jnp.asarray(ref) - y).max())
mark(f"EXACTNESS max|kernel-XLA| = {err:.3e}  (shapes {ref.shape} {y.shape})")

for S in (32, 40, 48, 56):
    try:
        f = lambda xc: K2.pfb2_resample_pallas(xc, pfb, 147, 160, phi0,
                                               dfc, out_len, S=S)
        sync(f(xj))
        t = timeit(f, xj, k=16)
        mark(f"S={S}: {t*1e3:.3f} ms ({n/t/1e9:.1f} GS/s)")
    except Exception as e:
        mark(f"S={S} FAIL {type(e).__name__}: {str(e)[:300]}")

# --- dimension_semantics A/B on a hand-rolled call (S=40)
def variant(S, dimsem, contiguous=False):
    P_in, O_r, Cg, G = plan.P_in, plan.O_r, plan.Cg, plan.G
    grp, D_c, off_rel = plan.grp_stride, plan.D_c, plan.off_rel
    r_lo = tuple(int(v) for v in plan.r_lo)
    R = -(-n // 128)
    x2 = xj.reshape(R, 128)
    out_rows = -(-out_len // 128)
    nsuper = -(-out_rows // O_r)
    Sv = max(2, min(S, nsuper))
    nst = -(-nsuper // Sv)
    prec = jax.lax.Precision.HIGHEST
    R8 = R // 8
    x8 = x2[: R8 * 8].reshape(R8, 8, 128)
    tile_rows = Sv * P_in
    t8 = tile_rows // 8
    if plan.tabg_dev is None:
        plan.tabg_dev = jax.device_put(plan.tabg)

    def kern(xa, xprev, xnext, tabg, o_ref):
        g = pl.program_id(0)
        st = pl.program_id(1)
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                precision=prec)
        sup = jax.lax.broadcasted_iota(jnp.int32, (Sv, 1), 0)
        base = st * (Sv * P_in)
        for gi in range(G):
            @pl.when(g == gi)
            def _(gi=gi):
                for ci in range(Cg):
                    c = gi * Cg + ci
                    acc = None
                    for d in range(D_c[c]):
                        rr = max(min(r_lo[c] + d, P_in - 1), 0)
                        T = tabg[off_rel[c] + d*128: off_rel[c]+(d+1)*128, :]
                        if contiguous:
                            rows = xa[(c % (P_in - 1)) * Sv % (tile_rows - Sv):
                                      (c % (P_in - 1)) * Sv % (tile_rows - Sv) + Sv, :]
                        else:
                            rows = xa[pl.Slice(rr, Sv, P_in), :]
                        live = base + rr + P_in * sup < R
                        part = dot(jnp.where(live, rows, 0.0), T)
                        acc = part if acc is None else acc + part
                    o_ref[:, 0, ci, :] = acc

    cp = (pltpu.CompilerParams(dimension_semantics=dimsem)
          if dimsem else None)
    @jax.jit
    def f(x2, x8, tabg):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nst*Sv, G, Cg, 128), jnp.float32),
            grid=(G, nst),
            in_specs=[
                pl.BlockSpec((tile_rows, 128), lambda g, st: (st, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128),
                             lambda g, st: (jnp.maximum(st*t8-1, 0), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128),
                             lambda g, st: (jnp.minimum((st+1)*t8, R8-1), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp, 128), lambda g, st: (g, 0),
                             memory_space=pltpu.VMEM,
                             pipeline_mode=pl.Buffered(buffer_count=1)),
            ],
            out_specs=pl.BlockSpec((Sv, 1, Cg, 128),
                                   lambda g, st: (st, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            **({"compiler_params": cp} if cp else {}),
        )(x2, x8, tabg)
    return lambda: f(x2, x8, plan.tabg_dev)

for name, S, dimsem, cont in (
        ("base S40", 40, None, False),
        ("dimsem arb,arb S40", 40, ("arbitrary", "arbitrary"), False),
        ("contiguous-loads S40 (bound)", 40, None, True)):
    try:
        f = variant(S, dimsem, cont)
        sync(f())
        t = timeit(lambda: f(), k=16)
        mark(f"{name}: {t*1e3:.3f} ms")
    except Exception as e:
        mark(f"{name} FAIL {type(e).__name__}: {str(e)[:300]}")
print("DONE")
