# pfb2 grouped: S stability re-runs + integrated filt() path + 3//2.
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("dsptpu"):
        del sys.modules[m]
from fractions import Fraction
import dsptpu
from dsptpu.filters import stream_filt as sfm
from dsptpu.kernels import pfb2 as K2
import dsptpu.ops.dspbase as db

ratio = Fraction(147, 160)
h = np.asarray(dsptpu.resample_filter(ratio)).astype(np.float32)
pfb = sfm.taps2pfb(h, 147)
n = 10_000_000
x = np.random.default_rng(7).standard_normal(n).astype(np.float32)
xj = jax.device_put(x)
k0 = sfm.FIRFilter(h, ratio).kernel
phi0, dfc = k0.phi_idx, k0.input_deficit
out_len = k0.output_length(n)

for S in (48, 56, 64, 48, 40):
    try:
        f = lambda xc: K2.pfb2_resample_pallas(xc, pfb, 147, 160, phi0,
                                               dfc, out_len, S=S)
        sync(f(xj))
        ts = [timeit(f, xj, k=16) for _ in range(2)]
        mark(f"S={S}: " + " ".join(f"{t*1e3:.3f}" for t in ts) + " ms")
    except Exception as e:
        mark(f"S={S} FAIL {type(e).__name__}: {str(e)[:200]}")

# integrated default path (gate should route grouped now)
assert db._PALLAS_OS is not False
sf = sfm.FIRFilter(h, ratio)
def dev(xc):
    sf.reset()
    return sf.filt(xc)
sync(dev(xj))
mark(f"gate: {getattr(sf.kernel, '_pfb2_gate', None) is not None and sf.kernel._pfb2_gate[2:]}")
t = timeit(dev, xj, k=16)
mark(f"FIRFilter.filt 147//160 integrated: {t*1e3:.3f} ms ({n/t/1e9:.1f} GS/s)")

# 3//2 resident regression
h32 = np.asarray(dsptpu.resample_filter(Fraction(3, 2))).astype(np.float32)
sfb = sfm.FIRFilter(h32, Fraction(3, 2))
def devb(xc):
    sfb.reset()
    return sfb.filt(xc)
sync(devb(xj))
tb = timeit(devb, xj, k=16)
mark(f"FIRFilter.filt 3//2 resident: {tb*1e3:.3f} ms ({n/tb/1e9:.1f} GS/s)")
print("DONE")
