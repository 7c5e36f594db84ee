"""Honest primitive costs for binning redesign (data-dependent inputs)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from jax import lax

N = 262_144
M = 1_048_576
K = 10
rng = np.random.default_rng(0)
# device-resident, genuinely runtime data
vals_n = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
idx_m = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))  # sorted idx
ridx_m = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))           # random idx
offs_n = jnp.asarray(np.sort(rng.integers(0, M, N)).astype(np.int32))
key_m = jnp.asarray(rng.integers(0, 1 << 30, M, dtype=np.int32))
wide_n = jnp.asarray(rng.uniform(0, 1, (N + 1, 16)).astype(np.float32))
w_m = jnp.asarray(rng.integers(1, 5, M, dtype=np.int32))


def timeit(name, fn, *args):
    def run(args):
        def body(i, carry):
            out = fn(*carry)
            # consume the FULL output so XLA cannot shortcut the op
            a0 = carry[0]
            s = jnp.sum(out.reshape(-1) * jnp.arange(out.size) % 7)
            if a0.dtype == jnp.int32:
                a0 = a0 + (s.astype(jnp.int32) & 0)
                a0 = a0.at[0].add(s.astype(jnp.int32) & 1)
            else:
                a0 = a0.at[0].add(s * 1e-30)
            return (a0,) + carry[1:]
        return lax.fori_loop(0, K, body, args)
    f = jax.jit(run)
    out = f(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:46s} {dt*1000:8.2f} ms/iter", flush=True)


timeit("gather [1M]<-[262k] i32 (sorted idx)",
       lambda i, v: v[jnp.clip(i, 0, N - 1)], idx_m, vals_n)
timeit("gather [1M]<-[262k] i32 (random idx)",
       lambda i, v: v[jnp.clip(i, 0, N - 1)], ridx_m, vals_n)
timeit("3x gather [1M]<-[262k] i32 (random)",
       lambda i, v: v[jnp.clip(i, 0, N - 1)] + v[jnp.clip(i + 1, 0, N - 1)]
       + v[jnp.clip(i + 2, 0, N - 1)], ridx_m, vals_n)
timeit("scatter-add [262k]->[1M] + cumsum [1M]",
       lambda o, v: jnp.cumsum(
           jnp.zeros((M,), jnp.int32).at[jnp.clip(o, 0, M - 1)].add(
               v, mode="drop")),
       offs_n, vals_n)
timeit("cumsum [1M] i32",
       lambda k: jnp.cumsum(k), key_m)
timeit("scatter [262k]->[4,1M] + cumsum axis1",
       lambda o, v: jnp.cumsum(
           jnp.zeros((4, M), jnp.int32).at[:, jnp.clip(o, 0, M - 1)].add(
               jnp.stack([v, v + 1, v + 2, v + 3]), mode="drop"),
           axis=1),
       offs_n, vals_n)
timeit("int div+mod [1M]",
       lambda a, w: (a // w) * 53 + (a - (a // w) * w), key_m, w_m)
timeit("sort i32 [1M] unstable 1key",
       lambda k: lax.sort((k,), dimension=0, is_stable=False, num_keys=1)[0],
       key_m)
timeit("sort i32 [1M] +1 payload",
       lambda k, v: lax.sort((k, v), dimension=0, is_stable=False,
                             num_keys=1)[0],
       key_m, w_m)
timeit("sort i32 [8,128k] batched dim1",
       lambda k: lax.sort((k.reshape(8, M // 8),), dimension=1,
                          is_stable=False, num_keys=1)[0],
       key_m)
timeit("wide gather [1M,16]<-[262k,16] f32",
       lambda i, t: t[jnp.clip(i, 0, N)], ridx_m, wide_n)
timeit("wide gather + transpose to [16,1M]",
       lambda i, t: t[jnp.clip(i, 0, N)].T, ridx_m, wide_n)
timeit("searchsorted 4346 in [1M]",
       lambda k: jnp.searchsorted(k, jnp.arange(4346, dtype=jnp.int32)),
       key_m)
print("done", flush=True)
