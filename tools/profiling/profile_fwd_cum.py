"""Cumulative bisect of the forward render chain at garden scale."""
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
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops import render as render_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.projection import TILE
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 1297, 840
n = 262_144
max_instances = 2_097_152
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
gt = jnp.asarray(rng.uniform(0, 1, (3, height, width)), jnp.float32)
bg = jnp.zeros((3,), jnp.float32)
alive = gmod.alive_mask(state)
lp = jnp.asarray(0.3, jnp.float32)
grid_x, grid_y = (width + 15) // 16, (height + 15) // 16

def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1000:8.2f} ms", flush=True)
    return out

def prep_of(params):
    scales, quats, opac, shs = gmod.activate(params)
    return proj_ops.preprocess(
        params.xyz, scales, quats, opac, shs, alive, sh_degree=3,
        world_view=camera["world_view"], full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=width, height=height, low_pass=lp)

@jax.jit
def a1(params):
    return prep_of(params)
timeit("A1 preprocess", a1, state.params)

@jax.jit
def a2(params):
    prep = prep_of(params)
    return binning_ops.bin_gaussians(prep, grid_x, grid_y, max_instances)
timeit("A2 + binning", a2, state.params)

@jax.jit
def a3(params):
    prep = prep_of(params)
    binn = binning_ops.bin_gaussians(prep, grid_x, grid_y, max_instances)
    gidx = binn.gauss_idx
    pergauss = jnp.concatenate([
        prep.xy, prep.conic, prep.opacity[:, None], prep.rgb,
        prep.depth[:, None]], axis=1)
    pergauss = jnp.concatenate(
        [pergauss, jnp.zeros_like(pergauss[:1])], axis=0)
    inst = pergauss[gidx]
    tid = jnp.minimum(binn.tile_id, grid_x * grid_y - 1)
    origin = jnp.stack([tid % grid_x * TILE, tid // grid_x * TILE],
                       axis=-1).astype(jnp.float32)
    xy_local = inst[:, 0:2] - origin
    pack = tile_render._pack_padded(xy_local, inst[:, 2:5], inst[:, 5],
                                    inst[:, 6:9], inst[:, 9])
    return pack, binn.tile_start, binn.tile_end
timeit("A3 + gather/pack", a3, state.params)

@jax.jit
def a4(params):
    pack, starts, ends = a3.__wrapped__(params)
    return tile_render._composite_fwd_impl(pack, starts, ends,
                                           interpret=False)
timeit("A4 + composite fwd kernel", a4, state.params)

@jax.jit
def a5(params, gt):
    tiles = a4.__wrapped__(params)
    img = render_ops.assemble_image(tiles, grid_x, grid_y, height, width)
    color = (img[..., 0:3] + img[..., 5:6] * bg[None, None, :]
             ).transpose(2, 0, 1)
    loss, _ = loss_ops.training_loss(color, gt, 0.2)
    return loss
timeit("A5 + assemble + loss", a5, state.params, gt)
