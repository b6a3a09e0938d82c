import sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, "/root/repo")
from magellanmapper_tpu.ops import filters, pallas_kernels
from magellanmapper_tpu.cv import detector
SHAPE=(128,256,256); SIGMAS=tuple(np.linspace(2.0,4.0,8)); THRESH, OV, CAP = 0.1, 0.5, 8192
rng = np.random.default_rng(0)
vol = rng.normal(scale=0.02, size=SHAPE).astype(np.float32)
coords = np.column_stack([rng.integers(6, s-6, 600) for s in SHAPE])
zz, yy, xx = np.indices((13,13,13)).astype(np.float32)-6
for (cz,cy,cx), r in zip(coords, rng.uniform(3,5.5,600)):
    sig = r/np.sqrt(3)
    vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += np.exp(-(zz**2+yy**2+xx**2)/(2*sig**2))
vol = jnp.asarray(np.clip(vol,0,None)/vol.max())

def timeit(fn, x, iters=10):
    @jax.jit
    def chain(x):
        def body(i, acc):
            return acc + fn(x + acc*jnp.float32(1e-30))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    t0=time.perf_counter(); float(np.asarray(chain(x))); cs=time.perf_counter()-t0
    t0=time.perf_counter(); float(np.asarray(chain(x)))
    return (time.perf_counter()-t0)/iters*1e3, cs

def full(x):
    raw, valid = detector.blob_log(x, SIGMAS, THRESH, OV, CAP)
    return jnp.sum(raw)*jnp.float32(1e-30) + valid.sum().astype(jnp.float32)
ms, cs = timeit(full, vol)
print(f"full blob_log v2: {ms:.3f} ms -> {np.prod(SHAPE)/1e6/(ms/1e3):.1f} Mvox/s (compile {cs:.0f}s)", flush=True)

cube = filters.log_pyramid(vol, SIGMAS); cube.block_until_ready()
def fp(c):
    co, v, n = pallas_kernels.find_peaks_fused(c, THRESH, CAP)
    return jnp.sum(co).astype(jnp.float32)*jnp.float32(1e-30) + n.astype(jnp.float32)
ms, cs = timeit(fp, cube)
print(f"find_peaks_fused v2: {ms:.3f} ms (compile {cs:.0f}s)", flush=True)
# correctness vs XLA path on-chip
from magellanmapper_tpu.ops import peaks
kc, kv, kn = pallas_kernels.find_peaks_fused(cube, THRESH, CAP)
oc, ov2, on2 = peaks.find_peaks(cube, THRESH, CAP, fused=False)
a = set(map(tuple, np.asarray(oc)[:int(on2)].tolist()))
b = set(map(tuple, np.asarray(kc)[:int(kn)].tolist()))
print(f"counts xla={int(on2)} v2={int(kn)}; coord sets equal: {a==b}", flush=True)
