import sys, time
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
x = jnp.asarray(np.random.default_rng(0).random((8,128,256,256), dtype=np.float32))
x.block_until_ready()

def timeit(fn, *args, iters=10):
    @jax.jit
    def chain(*a):
        def body(i, acc):
            return acc + fn(*[q + acc*jnp.float32(1e-30) for q in a])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    float(np.asarray(chain(*args)))
    t0=time.perf_counter(); float(np.asarray(chain(*args)))
    return (time.perf_counter()-t0)/iters*1e3

mb = x.size * 4 / 1e6
ms = timeit(lambda v: jnp.sum(v), x)
print(f"sum (read {mb:.0f} MB): {ms:.2f} ms -> {mb/ms:.0f} GB/s", flush=True)
ms = timeit(lambda v: jnp.sum(v * 1.000001 + 0.5), x)
print(f"axpy+sum (read+? {mb:.0f} MB): {ms:.2f} ms -> {mb/ms:.0f} GB/s", flush=True)
def copy_sum(v):
    y = v * jnp.float32(1.000001)
    return jnp.sum(y) + y[0,0,0,0]   # force materialization
ms = timeit(copy_sum, x)
print(f"copy+sum (~{2*mb:.0f} MB): {ms:.2f} ms -> {2*mb/ms:.0f} GB/s", flush=True)
# big GEMM at a compute-heavy shape for MXU rate: (4096,4096)@(4096,4096)
a = jnp.asarray(np.random.default_rng(1).random((4096,4096), dtype=np.float32))
ms = timeit(lambda q: jnp.sum(q @ q * jnp.float32(1e-30)), a)
fl = 2*4096**3/1e12
print(f"4096^3 GEMM DEFAULT: {ms:.2f} ms -> {fl/(ms/1e3):.1f} TFLOP/s", flush=True)
ms = timeit(lambda q: jnp.sum(jnp.matmul(q, q, precision=jax.lax.Precision.HIGH) * jnp.float32(1e-30)), a)
print(f"4096^3 GEMM HIGH: {ms:.2f} ms -> {fl/(ms/1e3):.1f} TFLOP/s", flush=True)
