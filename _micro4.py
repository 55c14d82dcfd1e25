import time, numpy as np, jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
U = 1<<22; M = 1<<22
ivl_start = jnp.sort(jax.random.randint(key, (M,), 0, U-100, dtype=jnp.int32))
ivl_end = ivl_start + 100
seg = jnp.sort(jax.random.randint(key, (M,), 0, M, dtype=jnp.int32))
vals = jnp.ones((M,), jnp.int32)
uncov = jnp.ones((U,), jnp.int32)

def bench(name, f, *a, n=3):
    r = f(*a); _ = np.asarray(r if isinstance(r, jax.Array) else r[0])  # warm+compile
    t0=time.time()
    for _i in range(n):
        r = f(*a)
        out = np.asarray((r if isinstance(r, jax.Array) else r[0])[:1])
    print("%s: %.2f ms" % (name, (time.time()-t0)/n*1000), flush=True)

bench("noop gather1", jax.jit(lambda x: x[:1]+1), uncov)
bench("cumsum 4M i32", jax.jit(lambda x: jnp.cumsum(x)), uncov)
pre = jnp.cumsum(uncov)
bench("gather 2x4M", jax.jit(lambda pre, s, e: pre[e] - pre[s]), pre, ivl_start, ivl_end)
bench("segment_sum sorted 4M->4M", jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=M)), vals, seg)
bench("segment_sum sorted-flag", jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=M, indices_are_sorted=True)), vals, seg)
bench("scatter-add 2x4M", jax.jit(lambda s, e: jnp.zeros((U+1,), jnp.int32).at[s].add(1).at[e].add(-1)), ivl_start, ivl_end)
