"""Binning sub-stage attribution at garden-proxy scale."""
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
    print(f"{name:42s} {dt*1000:8.2f} ms/iter", flush=True)
    return out


def chain(fn):
    """Run fn K times chained through a perturbation scalar."""
    def run(d0):
        def body(i, carry):
            d, acc = carry
            s = fn(d)
            return (d + 1e-30 * s, acc + s)
        return lax.fori_loop(0, K, body, (d0, jnp.float32(0)))
    return run


# stage 1: argsort by depth
def s1(depth):
    visible = prep.tiles_touched > 0
    dk = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(dk, stable=True).astype(jnp.int32)
    return order[0].astype(jnp.float32)
timeit("argsort depth (N=262k)", chain(s1), prep.depth)

visible = prep.tiles_touched > 0
dk = jnp.where(visible, prep.depth, jnp.inf)
order = jnp.argsort(dk, stable=True).astype(jnp.int32)

# stage 2: cumsum + scatter bump + rank cumsum
def s2(depth):
    tiles_o = prep.tiles_touched[order] + (depth[:1] * 1e-30).astype(jnp.int32)
    offs = jnp.cumsum(tiles_o)
    exc = (offs - tiles_o).astype(jnp.int32)
    bumps = jnp.zeros((M,), jnp.int32).at[offs].add(1, mode="drop")
    rank = jnp.minimum(jnp.cumsum(bumps), n - 1)
    return rank[0].astype(jnp.float32) + exc[0].astype(jnp.float32)
timeit("offsets+scatter-bump+rank (M=1M)", chain(s2), prep.depth)

tiles_o = prep.tiles_touched[order]
offs = jnp.cumsum(tiles_o)
total = offs[-1]
exc = (offs - tiles_o).astype(jnp.int32)
i = jnp.arange(M, dtype=jnp.int32)
bumps = jnp.zeros((M,), jnp.int32).at[offs].add(1, mode="drop")
rank = jnp.minimum(jnp.cumsum(bumps), n - 1)

# stage 3: rect gathers + tile compute
def s3(depth):
    w_d = jnp.maximum(prep.rect_wh[order, 0], 1).astype(jnp.int32)
    base_d = (prep.rect_min[order, 1] * grid_x +
              prep.rect_min[order, 0]).astype(jnp.int32)
    local = i - exc[rank]
    w_i = w_d[rank]
    dy = local // w_i
    dx = local - dy * w_i
    tile = base_d[rank] + dy * grid_x + dx
    tile = tile + (depth[:1] * 1e-30).astype(jnp.int32)
    valid = i < jnp.minimum(total, M)
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    return tile[0].astype(jnp.float32)
timeit("instance tile-id gathers (M=1M)", chain(s3), prep.depth)

w_d = jnp.maximum(prep.rect_wh[order, 0], 1).astype(jnp.int32)
base_d = (prep.rect_min[order, 1] * grid_x +
          prep.rect_min[order, 0]).astype(jnp.int32)
local = i - exc[rank]
w_i = w_d[rank]
dy = local // w_i
dx = local - dy * w_i
tile = base_d[rank] + dy * grid_x + dx
valid = i < jnp.minimum(total, M)
tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
rank_bits = max(int(n - 1).bit_length(), 1)
print("rank_bits", rank_bits, "packed fits:",
      (n_tiles + 1) << rank_bits <= 2**31, flush=True)

# stage 4: the sort
def s4(depth):
    key = (tile << rank_bits) | jnp.where(valid, rank, 0)
    key = key + (depth[:1] * 1e-30).astype(jnp.int32)
    key_sorted = lax.sort((key,), dimension=0, is_stable=False,
                          num_keys=1)[0]
    return key_sorted[0].astype(jnp.float32)
timeit("packed int32 sort (M=1M)", chain(s4), prep.depth)

key = (tile << rank_bits) | jnp.where(valid, rank, 0)
key_sorted = lax.sort((key,), dimension=0, is_stable=False, num_keys=1)[0]
tile_sorted = key_sorted >> rank_bits
rank_sorted = key_sorted & ((1 << rank_bits) - 1)

# stage 5: searchsorted + final gathers
def s5(depth):
    in_range = tile_sorted < n_tiles
    rs = jnp.where(in_range, rank_sorted, n)
    order_pad = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
    gauss_sorted = order_pad[rs]
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    ts = jnp.searchsorted(tile_sorted, tids, side="left")
    te = jnp.searchsorted(tile_sorted, tids, side="right")
    return (gauss_sorted[0] + ts[0] + te[0]).astype(jnp.float32) \
        + depth[0] * 1e-30
timeit("searchsorted + gauss gather", chain(s5), prep.depth)

# alt: sort with values carried (two-operand)
def s6(depth):
    key = (tile << rank_bits) | jnp.where(valid, rank, 0)
    key = key + (depth[:1] * 1e-30).astype(jnp.int32)
    ks, vs = lax.sort((key, rank), dimension=0, is_stable=False, num_keys=1)
    return ks[0].astype(jnp.float32) + vs[0].astype(jnp.float32)
timeit("int32 sort + 1 value (M=1M)", chain(s6), prep.depth)

# alt: smaller M sort
for MM in (524_288, 2_097_152, 4_194_304):
    key_mm = jnp.tile(key, (MM // M,)) if MM > M else key[:MM]
    def s7(k):
        ks = lax.sort((k,), dimension=0, is_stable=False, num_keys=1)[0]
        return ks
    def body(d):
        ks = lax.sort(((key_mm + (d[:1] * 1e-30).astype(jnp.int32)),),
                      dimension=0, is_stable=False, num_keys=1)[0]
        return ks[0].astype(jnp.float32)
    timeit(f"int32 sort M={MM}", chain(body), prep.depth)
print("done", flush=True)
