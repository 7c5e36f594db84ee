"""Sub-stage attribution of the CURRENT (delta-scatter) binning design,
plus candidate replacements for the slow stages."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from jax import lax
from rain_tpu.data.cameras import Camera
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 1297, 840
n = 262_144
M = 1_048_576
K = 10
rng = np.random.default_rng(0)
pts = np.concatenate([rng.uniform(-3, 3, (n, 2)),
                      rng.uniform(2.0, 12.0, (n, 1))], axis=1).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
state = gmod.from_arrays(
    xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
    f_rest=np.zeros((n, 15, 3), np.float32),
    scaling=np.full((n, 3), -4.5, np.float32),
    rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
    opacity=np.full((n, 1), -1.0, np.float32), capacity=n)
cam = Camera(uid=0, image_name="bench", R=np.eye(3), T=np.zeros(3),
             fovx=1.0, fovy=0.7, image=None, width=width, height=height)
camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
grid_x = (width + 15) // 16
grid_y = (height + 15) // 16
n_tiles = grid_x * grid_y
alive = gmod.alive_mask(state)
scales, quats, opac, shs = gmod.activate(state.params)

prep = jax.jit(lambda xyz: proj_ops.preprocess(
    xyz, scales, quats, opac, shs, alive, sh_degree=3,
    world_view=camera["world_view"], full_proj=camera["full_proj"],
    camera_center=camera["camera_center"],
    tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
    width=width, height=height, low_pass=0.3))(state.params.xyz)
jax.block_until_ready(prep)


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


def chain(fn):
    def run(d0):
        def body(i, carry):
            d, acc = carry
            s = fn(d)
            return (d + 1e-30 * s, acc + s)
        return lax.fori_loop(0, K, body, (d0, jnp.float32(0)))
    return run


# whole binning
def s0(depth):
    p = prep._replace(depth=depth)
    b = binning_ops.bin_gaussians(p, grid_x, grid_y, M)
    return (b.tile_start[0] + b.gauss_idx[0]).astype(jnp.float32)
timeit("bin_gaussians total", chain(s0), prep.depth)

# 1. argsort via jnp.argsort (current)
def s1(depth):
    visible = prep.tiles_touched > 0
    dk = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(dk, stable=True).astype(jnp.int32)
    return order[0].astype(jnp.float32)
timeit("argsort depth jnp.argsort (N=262k)", chain(s1), prep.depth)

# 1b. argsort via lax.sort 2-op
def s1b(depth):
    visible = prep.tiles_touched > 0
    dk = jnp.where(visible, depth, jnp.inf)
    iota = lax.iota(jnp.int32, n)
    _, order = lax.sort((dk, iota), dimension=0, is_stable=True, num_keys=1)
    return order[0].astype(jnp.float32)
timeit("argsort via lax.sort (key,iota)", chain(s1b), prep.depth)

# 1c. argsort via bit-packed single key (depth>0 → monotone int bits;
# drop low 14 mantissa bits to make room for 18 idx bits)
def s1c(depth):
    visible = prep.tiles_touched > 0
    dk = jnp.where(visible, depth, jnp.float32(np.inf))
    bits = lax.bitcast_convert_type(dk, jnp.int32)
    idx_bits = 18
    key = (bits & ~((1 << idx_bits) - 1)) | lax.iota(jnp.int32, n)
    ks = lax.sort((key,), dimension=0, is_stable=False, num_keys=1)[0]
    order = ks & ((1 << idx_bits) - 1)
    return order[0].astype(jnp.float32)
timeit("argsort packed 1-key (lossy 14-bit depth)", chain(s1c), prep.depth)

visible = prep.tiles_touched > 0
dk = jnp.where(visible, prep.depth, jnp.inf)
order = jnp.argsort(dk, stable=True).astype(jnp.int32)

# 2. delta build + scatter + [4,M] cumsum (current stage 2)
def s2(depth):
    tiles_o = prep.tiles_touched[order] + (depth[:1] * 1e-30).astype(jnp.int32)
    offs = jnp.cumsum(tiles_o)
    exc = (offs - tiles_o).astype(jnp.int32)
    w_d = jnp.maximum(prep.rect_wh[order, 0], 1).astype(jnp.int32)
    base_d = (prep.rect_min[order, 1] * grid_x +
              prep.rect_min[order, 0]).astype(jnp.int32)
    rank_v = jnp.arange(n, dtype=jnp.int32)
    vals = jnp.stack([rank_v, exc, w_d, base_d], axis=0)
    deltas = vals - jnp.concatenate(
        [jnp.zeros((4, 1), jnp.int32), vals[:, :-1]], axis=1)
    acc = jnp.zeros((4, M), jnp.int32).at[:, exc].add(deltas, mode="drop")
    expanded = jnp.cumsum(acc, axis=1)
    return expanded[0, 0].astype(jnp.float32)
timeit("delta scatter + [4,M] cumsum", chain(s2), prep.depth)

# 2b. the [4,M] cumsum alone
acc0 = jnp.zeros((4, M), jnp.int32).at[:, :n].set(1)
def s2b(depth):
    a = acc0 + (depth[:1] * 1e-30).astype(jnp.int32)
    e = jnp.cumsum(a, axis=1)
    return e[0, 0].astype(jnp.float32)
timeit("[4,M] cumsum alone", chain(s2b), prep.depth)

# 2c. [M] cumsum alone
accf = acc0[0]
def s2c(depth):
    a = accf + (depth[:1] * 1e-30).astype(jnp.int32)
    e = jnp.cumsum(a)
    return e[0].astype(jnp.float32)
timeit("[M] int32 cumsum alone", chain(s2c), prep.depth)

# 2d. [N] gathers for order-indexed rect data
def s2d(depth):
    w_d = jnp.maximum(prep.rect_wh[order, 0], 1).astype(jnp.int32)
    base_d = (prep.rect_min[order, 1] * grid_x +
              prep.rect_min[order, 0]).astype(jnp.int32)
    return (w_d[0] + base_d[0]).astype(jnp.float32) + depth[0] * 1e-30
timeit("[N] rect gathers by order", chain(s2d), prep.depth)

binn = jax.jit(lambda: binning_ops.bin_gaussians(prep, grid_x, grid_y, M))()
jax.block_until_ready(binn)
print("num_instances:", int(binn.num_instances), flush=True)

# 3. searchsorted + order_pad gather (current stage 4)
tile_sorted = binn.tile_id
rank_sorted = jnp.where(tile_sorted < n_tiles, binn.rank, n)
def s3(depth):
    order_pad = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
    gauss_sorted = order_pad[rank_sorted]
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    ts = jnp.searchsorted(tile_sorted, tids, side="left")
    te = jnp.searchsorted(tile_sorted, tids, side="right")
    return (gauss_sorted[0] + ts[0] + te[0]).astype(jnp.float32) \
        + depth[0] * 1e-30
timeit("searchsorted + order_pad[M] gather", chain(s3), prep.depth)

# 3b. searchsorted alone
def s3b(depth):
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    ts = jnp.searchsorted(tile_sorted, tids, side="left")
    te = jnp.searchsorted(tile_sorted, tids, side="right")
    return (ts[0] + te[0]).astype(jnp.float32) + depth[0] * 1e-30
timeit("searchsorted alone", chain(s3b), prep.depth)

# 3c. tile ranges via scatter instead of searchsorted: for sorted tiles,
# start[t] = first i with tile==t → scatter-min; end = scatter-max+1
def s3c(depth):
    i = jnp.arange(M, dtype=jnp.int32)
    t = jnp.minimum(tile_sorted, n_tiles)
    ends = jnp.zeros((n_tiles + 1,), jnp.int32).at[t].max(
        i + 1, mode="drop")
    ends = lax.cummax(ends)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    return (starts[0] + ends[0]).astype(jnp.float32) + depth[0] * 1e-30
timeit("ranges via scatter-max + cummax", chain(s3c), prep.depth)

# 4. the [M] order_pad gather alone
def s4(depth):
    order_pad = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
    gauss_sorted = order_pad[rank_sorted]
    return gauss_sorted[0].astype(jnp.float32) + depth[0] * 1e-30
timeit("order_pad[rank_sorted] [M] gather", chain(s4), prep.depth)

# 5. wide-row pack gather variants
table = jnp.zeros((n + 1, 16), jnp.float32) + 1.0
def s5(depth):
    pk = table[binn.gauss_idx].T
    return pk[0, 0] + depth[0] * 1e-30
timeit("[N+1,16] row gather + T (current pack)", chain(s5), prep.depth)

def s5b(depth):
    pk = table[binn.gauss_idx]
    return pk[0, 0] + depth[0] * 1e-30
timeit("[N+1,16] row gather no transpose", chain(s5b), prep.depth)

tableT = table.T
def s5c(depth):
    pk = jnp.take(tableT, binn.gauss_idx, axis=1)
    return pk[0, 0] + depth[0] * 1e-30
timeit("[16,N+1] lane gather (take axis=1)", chain(s5c), prep.depth)

table8a = jnp.zeros((n + 1, 8), jnp.float32) + 1.0
def s5d(depth):
    pk = jnp.concatenate([table8a[binn.gauss_idx],
                          table8a[binn.gauss_idx]], axis=1).T
    return pk[0, 0] + depth[0] * 1e-30
timeit("2x [N+1,8] row gathers + T", chain(s5d), prep.depth)

print("done", flush=True)
