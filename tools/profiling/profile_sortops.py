"""Multi-operand lax.sort cost vs payload count (hoist-proof), plus
scatter-add and gather reference points, at N=262k and M=1M."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from jax import lax

K = 10
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:46s} {dt*1000:8.2f} ms/iter", flush=True)
    return out


def chain_i32(fn, x0):
    """fori chain where fn's int32 input changes every iteration."""
    def run(x):
        def body(i, carry):
            x, acc = carry
            s = fn(x ^ i)
            return (x, acc + s)
        return lax.fori_loop(0, K, body, (x, jnp.int32(0)))
    return run, x0


for M in (262_144, 1_048_576):
    keys = jnp.asarray(rng.integers(0, 2**30, M, dtype=np.int32))
    pays = [jnp.asarray(rng.standard_normal(M), np.float32)
            for _ in range(12)]

    def baseline(x):
        return (x[0] ^ x[-1])
    run, x0 = chain_i32(baseline, keys)
    timeit(f"M={M}: baseline (no sort)", run, x0)

    for nops in (1, 2, 4, 8, 12):
        def f(x, nops=nops):
            ops = (x,) + tuple(
                lax.bitcast_convert_type(x + i, jnp.float32) * p
                for i, p in enumerate(pays[:nops - 1]))
            out = lax.sort(ops, dimension=0, is_stable=False, num_keys=1)
            r = out[0][0]
            for o in out[1:]:
                r = r ^ lax.bitcast_convert_type(o[0], jnp.int32)
            return r
        run, x0 = chain_i32(f, keys)
        timeit(f"M={M}: sort {nops}-operand", run, x0)

# gather / scatter reference (hoist-proof: index depends on loop var)
N = 262_145
M = 1_048_576
tab16 = jnp.asarray(rng.standard_normal((16, N)), np.float32)
idx = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))


def g16(ix):
    pk = jnp.take(tab16, jnp.abs(ix) % N, axis=1)
    return lax.bitcast_convert_type(pk[0, 0], jnp.int32)
run, x0 = chain_i32(g16, idx)
timeit("gather [16,N] cols by [M] idx", run, x0)


def g1(ix):
    v = tab16[0][jnp.abs(ix) % N]
    return lax.bitcast_convert_type(v[0], jnp.int32)
run, x0 = chain_i32(g1, idx)
timeit("gather [N] by [M] idx (1 row)", run, x0)

grads = jnp.asarray(rng.standard_normal((16, M)), np.float32)


def sc16(ix):
    d = jnp.zeros((16, N), jnp.float32).at[:, jnp.abs(ix) % N].add(
        grads, mode="drop")
    return lax.bitcast_convert_type(d[0, 0], jnp.int32)
run, x0 = chain_i32(sc16, idx)
timeit("scatter-add [16,M]→[16,N]", run, x0)

off = jnp.sort(jnp.asarray(rng.integers(0, M, N, dtype=np.int32)))


def bump(ix):
    b = jnp.zeros((M,), jnp.int32).at[
        jnp.minimum(off + (ix[0] & 1), M - 1)].add(1, mode="drop")
    c = jnp.cumsum(b)
    return c[0]
run, x0 = chain_i32(bump, idx)
timeit("bump scatter [N]→[M] + cumsum[M]", run, x0)


def just_cumsum(ix):
    c = jnp.cumsum(ix)
    return c[0]
run, x0 = chain_i32(just_cumsum, idx)
timeit("cumsum [M] alone", run, x0)
print("done", flush=True)
