# Persistent TPU worker: executes /tmp/tpuq/NNN.py jobs in-process.
# v2: single-readback sync (never block_until_ready, never touch a
# complex leaf directly), two-point chain-differencing timeit.
import time, math, os, glob, traceback, io, contextlib
import numpy as np, jax, jax.numpy as jnp, functools, importlib
t0 = time.time()
def mark(s): print(f"[{time.time()-t0:7.1f}s] {s}", flush=True)

_EXTRACT = {}
def sync(r):
    """One host readback of one real scalar; device runs in-order so
    this waits for everything enqueued before it. NEVER touches a
    complex leaf with eager ops (eager slice/real on complex64 raises
    UNIMPLEMENTED over the tunnel and WEDGES the client) -- prefers a
    real-dtype leaf, else extracts through a jitted program."""
    leaves = [l for l in jax.tree_util.tree_leaves(r)
              if hasattr(l, "shape")]
    if not leaves:
        return
    real = [l for l in leaves
            if not jnp.issubdtype(l.dtype, jnp.complexfloating)]
    if real:
        np.asarray(jnp.ravel(real[-1])[-1])
        return
    key = 0
    if key not in _EXTRACT:
        _EXTRACT[key] = jax.jit(lambda x: jnp.real(jnp.ravel(x)[-1]))
    np.asarray(_EXTRACT[key](leaves[-1]))

def timeit(fn, *a, reps=3, k=8):
    """(T(k2)-T(k1))/(k2-k1): per-chain RTT constant cancels."""
    sync(fn(*a))
    def chain(kk):
        t1 = time.perf_counter()
        r = None
        for _ in range(kk): r = fn(*a)
        sync(r)
        return time.perf_counter() - t1
    k1, k2 = 2, max(k, 6)
    b1 = min(chain(k1) for _ in range(reps))
    b2 = min(chain(k2) for _ in range(reps))
    return max((b2 - b1) / (k2 - k1), 1e-6)

timeit2 = timeit
mark(f"device {jax.devices()[0]}")
y = jnp.ones((8, 8)) @ jnp.ones((8, 8)); sync(y); mark("warm")
LAT = [0.0]
triv = jax.jit(lambda a: a * 1.000001)
xt = jnp.ones(128, jnp.float32); sync(triv(xt))
best = math.inf
for _ in range(5):
    t1 = time.perf_counter(); sync(triv(xt))
    best = min(best, time.perf_counter() - t1)
LAT[0] = best; mark(f"sync latency {LAT[0]*1e3:.1f} ms; WORKER READY")
ns = {"np": np, "jax": jax, "jnp": jnp, "functools": functools,
      "importlib": importlib, "sync": sync, "timeit": timeit,
      "timeit2": timeit, "mark": mark, "LAT": LAT, "time": time}
idle_since = time.time()
while time.time() - idle_since < 7200:
    jobs = sorted(glob.glob("/tmp/tpuq/*.py"))
    if not jobs:
        time.sleep(2)
        continue
    idle_since = time.time()
    for j in jobs:
        outp = j + ".out"
        buf = io.StringIO()
        try:
            src = open(j).read()
            os.remove(j)
            with contextlib.redirect_stdout(buf):
                exec(compile(src, j, "exec"), ns)
            status = "OK"
        except Exception:
            buf.write(traceback.format_exc())
            status = "ERR"
        open(outp, "w").write(f"[{status}]\n" + buf.getvalue())
        mark(f"job {os.path.basename(j)} -> {status}")
mark("idle timeout, exiting")
