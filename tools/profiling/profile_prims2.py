"""Re-measure primitives with DIFFERENT inputs per rep (defeat any
request-level result caching in the remote-execute path)."""
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
REPS = 8

def timeit(name, fn, args_list):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    outs = []
    t0 = time.perf_counter()
    for a in args_list[1:]:
        outs.append(fn(*a))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (len(args_list) - 1)
    print(f"{name:48s} {dt*1000:8.2f} ms", flush=True)

def variants(make):
    return [make(i) for i in range(REPS)]

# vary a scalar prefix so every call's inputs differ
vals16 = jnp.asarray(rng.uniform(0, 1, (N, 16)), jnp.float32)
idxs = variants(lambda i: (
    jnp.asarray(rng.integers(0, N, M, dtype=np.int32)),))
timeit("gather rows [2M,16] varying idx",
       jax.jit(lambda i: vals16[i]), idxs)

ones = variants(lambda i: (jnp.full((M,), 1 + i, jnp.int32),))
timeit("cumsum 2M i32 varying", jax.jit(lambda x: jnp.cumsum(x)), ones)

keys = variants(lambda i: (
    jnp.asarray(rng.integers(0, 4346, M, dtype=np.int32)),
    jnp.asarray(rng.integers(0, N, M, dtype=np.int32))))
timeit("sort 2M key+payload varying",
       jax.jit(lambda k, p: jax.lax.sort((k, p), dimension=0,
                                         is_stable=True, num_keys=1)), keys)

pays = variants(lambda i: (
    jnp.asarray(rng.integers(0, 4346, M, dtype=np.int32)),
    *[jnp.asarray(rng.uniform(0, 1, M), jnp.float32) for _ in range(10)]))
timeit("sort 2M key+10 f32 payload varying",
       jax.jit(lambda k, *p: jax.lax.sort((k, *p), dimension=0,
                                          is_stable=True, num_keys=1)),
       pays)

cnts = variants(lambda i: (
    jnp.asarray(np.minimum(rng.poisson(2.34, N), 40).astype(np.int32)),))
timeit("repeat rows [2M,16] varying",
       jax.jit(lambda c: jnp.repeat(vals16, c, axis=0,
                                    total_repeat_length=M)), cnts)
