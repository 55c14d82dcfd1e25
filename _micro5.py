import time, numpy as np, jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (4096, 4096), dtype=jnp.bfloat16)
b = jax.random.normal(key, (4096, 4096), dtype=jnp.bfloat16)

def bench(name, f, *args, n=5, flops=None, bytes_=None):
    r = f(*args); _ = np.asarray(jnp.ravel(r)[:1])
    t0=time.time()
    for _i in range(n):
        r = f(*args)
        _ = np.asarray(jnp.ravel(r)[:1])
    dt = (time.time()-t0)/n
    extra = ""
    if flops: extra += " %.1f TFLOP/s" % (flops/dt/1e12)
    if bytes_: extra += " %.1f GB/s" % (bytes_/dt/1e9)
    print("%s: %.2f ms%s" % (name, dt*1000, extra), flush=True)

bench("matmul 4096^3 bf16", jax.jit(lambda a,b: a@b), a, b, flops=2*4096**3)
x = jax.random.normal(key, (1<<24,), dtype=jnp.float32)
bench("add 16M f32", jax.jit(lambda x: x+1.0), x, bytes_=2*(1<<24)*4)
bench("sum 16M f32", jax.jit(lambda x: jnp.sum(x)), x, bytes_=(1<<24)*4)
bench("cumsum 16M f32", jax.jit(lambda x: jnp.cumsum(x)), x, bytes_=2*(1<<24)*4)
i = jnp.arange(1<<22, dtype=jnp.int32)
bench("iota-gather 4M", jax.jit(lambda x, i: x[i]), x, i, bytes_=2*(1<<22)*4)
