# pfb2 grouped-mode (v3) on real TPU: correctness vs XLA block matmul
# + timing at 147//160 x 10M, S sweep.
import numpy as np, jax, jax.numpy as jnp, importlib, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
from fractions import Fraction
import dsptpu
from dsptpu.filters import stream_filt as sfm
from dsptpu.kernels import pfb2 as K2
from dsptpu.ops import dspbase

ratio = Fraction(147, 160)
h = np.asarray(dsptpu.resample_filter(ratio)).astype(np.float32)
pfb = sfm.taps2pfb(h, 147)
n = 10_000_000
rng = np.random.default_rng(7)
x = rng.standard_normal(n).astype(np.float32)
xj = jax.device_put(x)

f = sfm.FIRFilter(h, ratio)
f.setphase(f.timedelay())
k = f.kernel
phi0, dfc = k.phi_idx, k.input_deficit
out_len = k.output_length(n)
plan = K2.pfb2_plan(pfb, 147, 160, int(phi0), int(dfc))
mark(f"plan: G={plan.G} Cg={plan.Cg} grp_stride={plan.grp_stride} "
     f"tabg={plan.tabg.nbytes/2**20:.1f}MB P_in={plan.P_in} O_r={plan.O_r}")

# XLA reference timing (fresh FIRFilter so no pfb2 gate interference)
import dsptpu.ops.dspbase as db
db._PALLAS_OS = False
fx = sfm.FIRFilter(h, ratio)
fx.setphase(fx.timedelay())
def xla_path(xc):
    fx.reset()
    return fx.filt(xc)
t_xla = timeit(xla_path, xj, k=16)
ref = xla_path(xj)
mark(f"XLA block matmul: {t_xla*1e3:.3f} ms ({n/t_xla/1e9:.1f} GS/s)")
db._PALLAS_OS = True

# kernel correctness + S sweep
refh = None
for S in (16, 24, 32, 40):
    try:
        def kern_path(xc):
            return K2.pfb2_resample_pallas(xc, pfb, 147, 160, phi0, dfc,
                                           out_len, S=S)
        y = kern_path(xj)
        sync(y)
        if refh is None:
            m = min(ref.shape[0], y.shape[0])
            refh = np.asarray(jnp.abs(jnp.asarray(ref)[:m] - y[:m]).max())
            mark(f"S={S} max|kernel - XLA|[:{m}] = {float(refh):.3e}")
        t = timeit(kern_path, xj, k=16)
        mark(f"S={S}: {t*1e3:.3f} ms ({n/t/1e9:.1f} GS/s, "
             f"{(48+36.8+22.4+4)/t/1e3:.0f} GB/s-ish)")
    except Exception as e:
        mark(f"S={S} FAIL {type(e).__name__}: {str(e)[:500]}")
print("DONE")
