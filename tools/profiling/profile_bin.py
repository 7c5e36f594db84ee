"""Bisect binning + gather/pack internals at garden scale (real args)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from rain_tpu.data.cameras import Camera
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 1297, 840
n = 262_144
M = 2_097_152
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
alive = gmod.alive_mask(state)
grid_x, grid_y = (width + 15) // 16, (height + 15) // 16
n_tiles = grid_x * grid_y

prep = jax.jit(lambda p: proj_ops.preprocess(
    p.xyz, *gmod.activate(p)[0:3], gmod.activate(p)[3], alive, sh_degree=3,
    world_view=camera["world_view"], full_proj=camera["full_proj"],
    camera_center=camera["camera_center"],
    tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
    width=width, height=height, low_pass=0.3))(state.params)
prep = jax.block_until_ready(prep)

def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt*1000:8.2f} ms", flush=True)
    return out

# --- binning pieces (arguments passed explicitly → no constant folding)
@jax.jit
def argsort_depth(depth, tiles_touched):
    visible = tiles_touched > 0
    return jnp.argsort(jnp.where(visible, depth, jnp.inf), stable=True)
order = timeit("b1 argsort depth (262k)", argsort_depth, prep.depth,
               prep.tiles_touched)

@jax.jit
def expand(order, prep_tiles, rect_min, rect_wh):
    tiles_o = prep_tiles[order]
    offs = jnp.cumsum(tiles_o)
    pack5 = jnp.stack([
        offs - tiles_o, rect_min[order, 0], rect_min[order, 1],
        jnp.maximum(rect_wh[order, 0], 1), order.astype(jnp.int32)], axis=1)
    i = jnp.arange(M, dtype=jnp.int32)
    bumps = jnp.zeros((M,), jnp.int32).at[offs].add(1, mode="drop")
    g_c = jnp.minimum(jnp.cumsum(bumps), order.shape[0] - 1)
    row = pack5[g_c]
    local = i - row[:, 0]
    w = row[:, 3]
    dy = local // w
    dx = local - dy * w
    tile = ((row[:, 2] + dy) * grid_x + row[:, 1] + dx).astype(jnp.int32)
    valid = i < jnp.minimum(offs[-1], M)
    tile = jnp.where(valid, tile, n_tiles)
    return tile, row[:, 4]
tile_ids, gauss_ids = timeit("b2 expand to 2M instances", expand, order,
                             prep.tiles_touched, prep.rect_min, prep.rect_wh)

@jax.jit
def sort2(tile, gauss):
    return jax.lax.sort((tile, gauss), dimension=0, is_stable=True,
                        num_keys=1)
ts, gs = timeit("b3 stable sort 2M (key+payload)", sort2, tile_ids,
                gauss_ids)

@jax.jit
def sort_packed(tile, gauss_rank):
    key = tile * (1 << 18) + gauss_rank
    out = jax.lax.sort((key,), dimension=0, is_stable=False, num_keys=1)[0]
    return out >> 18, out & ((1 << 18) - 1)
timeit("b3' unstable sort 2M packed key", sort_packed, tile_ids,
       jnp.arange(M, dtype=jnp.int32) % (1 << 18))

@jax.jit
def ranges(ts):
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    return (jnp.searchsorted(ts, tids, side="left"),
            jnp.searchsorted(ts, tids, side="right"))
timeit("b4 searchsorted ranges", ranges, ts)

@jax.jit
def ranges_scatter(ts):
    # counts per tile via scatter-add, then exclusive scan
    cnt = jnp.zeros((n_tiles + 1,), jnp.int32).at[ts].add(1, mode="drop")
    end = jnp.cumsum(cnt[:-1])
    start = end - cnt[:-1]
    return start, end
timeit("b4' ranges via scatter+cumsum", ranges_scatter, ts)

# --- gather/pack pieces
@jax.jit
def build_pergauss(prep_xy, conic, opac, rgb, depth):
    pergauss = jnp.concatenate([
        prep_xy, conic, opac[:, None], rgb, depth[:, None]], axis=1)
    return jnp.concatenate([pergauss, jnp.zeros_like(pergauss[:1])], axis=0)
pg = timeit("g1 build pergauss [262k,10]", build_pergauss, prep.xy,
            prep.conic, prep.opacity, prep.rgb, prep.depth)

@jax.jit
def rowgather(pg, gs):
    return pg[gs]
inst = timeit("g2 row gather [2M,10]", rowgather, pg, gs)

@jax.jit
def pack16(inst, ts):
    tid = jnp.minimum(ts, n_tiles - 1)
    origin = jnp.stack([tid % grid_x * 16, tid // grid_x * 16],
                       axis=-1).astype(jnp.float32)
    xy_local = inst[:, 0:2] - origin
    return tile_render._pack_padded(xy_local, inst[:, 2:5], inst[:, 5],
                                    inst[:, 6:9], inst[:, 9])
timeit("g3 pack16 [16,2M] (transpose)", pack16, inst, ts)

@jax.jit
def rowgather16(pg16, gs):
    return pg16[gs]
pg16 = jnp.concatenate([pg, pg[:, :6]], axis=1)
timeit("g2' row gather [2M,16]", rowgather16, pg16, gs)
