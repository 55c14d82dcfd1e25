import time, numpy as np, jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
def bench(name, f, *args, n=3):
    r = f(*args); _ = np.asarray(jnp.ravel(r)[:1])
    t0=time.time()
    for _i in range(n):
        r = f(*args)
        _ = np.asarray(jnp.ravel(r)[:1])
    print("%s: %.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)

M = 1<<22
xi = jnp.ones((M,), jnp.int32)
xf = jnp.ones((M,), jnp.float32)
bench("cumsum 4M i32", jax.jit(lambda x: jnp.cumsum(x)), xi)
bench("cumsum 4M f32", jax.jit(lambda x: jnp.cumsum(x)), xf)
bench("cumsum 4M i32->f32", jax.jit(lambda x: jnp.cumsum(x.astype(jnp.float32))), xi)
# gather: sorted vs random indices
idx_sorted = jnp.sort(jax.random.randint(key, (M,), 0, M, dtype=jnp.int32))
idx_rand = jax.random.randint(key, (M,), 0, M, dtype=jnp.int32)
src = jnp.arange(M, dtype=jnp.float32)
bench("gather 4M sorted idx", jax.jit(lambda s, i: s[i]), src, idx_sorted)
bench("gather 4M random idx", jax.jit(lambda s, i: s[i]), src, idx_rand)
# 2D gather trick: reshape to (M/256, 256) take rows?
bench("take_along sorted", jax.jit(lambda s, i: jnp.take(s, i, indices_are_sorted=True)), src, idx_sorted)
# scatter small
idx_small = jax.random.randint(key, (512,), 0, M, dtype=jnp.int32)
bench("scatter-add 512", jax.jit(lambda i: jnp.zeros((M,), jnp.float32).at[i].add(1.0)), idx_small)
