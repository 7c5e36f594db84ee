"""Measure primitive alternatives for expansion + gather at 2M scale."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp

N = 262_144
M = 2_097_152
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.uniform(0, 1, (N, 16)), jnp.float32)
vals1 = vals[:, 0]
# plausible per-gaussian tile counts summing to ~612k
cnt = jnp.asarray(np.minimum(rng.poisson(2.34, N), 40).astype(np.int32))
offs = jnp.cumsum(cnt)
idx = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))

def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:48s} {dt*1000:8.2f} ms", flush=True)
    return out

timeit("cumsum 2M i32", jax.jit(lambda x: jnp.cumsum(x)),
       jnp.ones((M,), jnp.int32))
timeit("cumsum 2M f32", jax.jit(lambda x: jnp.cumsum(x)),
       jnp.ones((M,), jnp.float32))
timeit("assoc_scan add 2M f32",
       jax.jit(lambda x: jax.lax.associative_scan(jnp.add, x)),
       jnp.ones((M,), jnp.float32))
timeit("scatter-add 262k into 2M",
       jax.jit(lambda o: jnp.zeros((M,), jnp.int32).at[o].add(
           1, mode="drop")), offs)
timeit("gather 1-D [2M]<-[262k]",
       jax.jit(lambda v, i: v[i]), vals1, idx)
timeit("gather rows [2M,16]<-[262k,16]",
       jax.jit(lambda v, i: v[i]), vals, idx)
timeit("gather rows [2M,8]<-[262k,8]",
       jax.jit(lambda v, i: v[i]), vals[:, :8], idx)
timeit("take axis0 [2M,16]",
       jax.jit(lambda v, i: jnp.take(v, i, axis=0, unique_indices=False,
                                     indices_are_sorted=False)), vals, idx)
timeit("gather cols [16,2M]<-[16,262k]",
       jax.jit(lambda v, i: v[:, i]), vals.T, idx)
timeit("repeat total_len [2M]",
       jax.jit(lambda v, c: jnp.repeat(v, c, total_repeat_length=M)),
       vals1, cnt)
timeit("repeat rows total_len [2M,16]",
       jax.jit(lambda v, c: jnp.repeat(v, c, axis=0,
                                       total_repeat_length=M)), vals, cnt)

@jax.jit
def expand_cumsum_trick(vals1, offs):
    # monotone expansion: out[i] = vals1[g_c[i]] where g_c = #{offs <= i}
    # via scatter of deltas + cumsum
    delta = jnp.diff(vals1, prepend=0.0)
    buf = jnp.zeros((M,), jnp.float32).at[
        jnp.concatenate([jnp.zeros((1,), jnp.int32), offs[:-1]])
    ].add(delta, mode="drop")
    return jnp.cumsum(buf)
timeit("expand via scatter+cumsum [2M] f32", expand_cumsum_trick,
       vals1, offs)

# sort payload scaling
keys = jnp.asarray(rng.integers(0, 4346, M, dtype=np.int32))
pay = [jnp.asarray(rng.uniform(0, 1, M), jnp.float32) for _ in range(16)]
timeit("sort 2M key only",
       jax.jit(lambda k: jax.lax.sort((k,), dimension=0, num_keys=1)), keys)
timeit("sort 2M key+4 payload",
       jax.jit(lambda k, *p: jax.lax.sort((k, *p), dimension=0,
                                          is_stable=True, num_keys=1)),
       keys, *pay[:4])
timeit("sort 2M key+16 payload",
       jax.jit(lambda k, *p: jax.lax.sort((k, *p), dimension=0,
                                          is_stable=True, num_keys=1)),
       keys, *pay)
