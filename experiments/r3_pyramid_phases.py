import sys, time
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from magellanmapper_tpu.ops import filters
SHAPE=(128,256,256); SIGMAS=[float(s) for s in np.linspace(2.0,4.0,8)]
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.random(SHAPE, dtype=np.float32))
vol.block_until_ready()
prec = jax.lax.Precision.HIGH

def bands(order, axis):
    n = SHAPE[axis]
    mats = [filters._band_matrix(
        np.asarray(filters.gaussian_kernel1d(s, order), np.float64).tobytes(),
        len(filters.gaussian_kernel1d(s, order)), n, "reflect", 0.0) for s in SIGMAS]
    return jnp.asarray(np.stack(mats), dtype=jnp.float32)
B0X, B2X, B0Y, B2Y, B0Z, B2Z = bands(0,2), bands(2,2), bands(0,1), bands(2,1), bands(0,0), bands(2,0)

def timeit(fn, *args, iters=10):
    @jax.jit
    def chain(*a):
        def body(i, acc):
            return acc + jnp.sum(fn(*[x + acc*jnp.float32(1e-30) for x in a]))*jnp.float32(1e-30)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    float(np.asarray(chain(*args)))
    t0=time.perf_counter(); float(np.asarray(chain(*args)))
    return (time.perf_counter()-t0)/iters*1e3

def ein(eq, *a):
    return jnp.einsum(eq, *a, precision=prec)

# phase 1: x-convs (2 einsums from vol)
def p1(v):
    return ein("zyx,sxu->szyu", v, B0X) + ein("zyx,sxu->szyu", v, B2X)
print(f"phase1 x-convs (2): {timeit(p1, vol):.2f} ms", flush=True)

a = ein("zyx,sxu->szyu", vol, B0X); a.block_until_ready()
# phase 2: y-convs (3 einsums from (s,z,y,x))
def p2(x4):
    return (ein("szyx,syu->szux", x4, B0Y) + ein("szyx,syu->szux", x4, B2Y)
            + ein("szyx,syu->szux", x4, B0Y))
print(f"phase2 y-convs (3): {timeit(p2, a):.2f} ms", flush=True)

u = ein("szyx,syu->szux", a, B0Y); u.block_until_ready()
def p3(x4):
    return (ein("szyx,szu->suyx", x4, B2Z) + ein("szyx,szu->suyx", x4, B0Z)
            + ein("szyx,szu->suyx", x4, B0Z))
print(f"phase3 z-convs (3): {timeit(p3, u):.2f} ms", flush=True)

# single y-conv via pre/post-transposed minor-axis form
def p2t(x4):
    t = jnp.swapaxes(x4, 2, 3)                      # (s,z,x,y) lane transpose
    o = ein("szxy,syu->szxu", t, B0Y)               # contract minor y
    return jnp.swapaxes(o, 2, 3)
print(f"y-conv single current: {timeit(lambda v: ein('szyx,syu->szux', v, B0Y), a):.2f} ms", flush=True)
print(f"y-conv single via swap: {timeit(p2t, a):.2f} ms", flush=True)
# y-conv in f32 DEFAULT for reference
print(f"y-conv single DEFAULT prec: {timeit(lambda v: jnp.einsum('szyx,syu->szux', v, B0Y, precision=jax.lax.Precision.DEFAULT), a):.2f} ms", flush=True)
print(f"full pyramid p0: {timeit(lambda v: filters.log_pyramid(v, SIGMAS), vol):.2f} ms", flush=True)
