"""Fine-grained breakdown of the backward-pass cost at garden scale."""
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
from rain_tpu.ops import render as render_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops import tile_render
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
scales, quats, opac, shs = gmod.activate(state.params)
grid_x = (width + 15) // 16
grid_y = (height + 15) // 16

def timeit(name, fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:38s} {dt*1000:8.2f} ms", flush=True)
    return out

@jax.jit
def prep_fn():
    return proj_ops.preprocess(
        state.params.xyz, scales, quats, opac, shs, alive, sh_degree=3,
        world_view=camera["world_view"], full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=width, height=height, low_pass=0.3)
prep = timeit("preprocess fwd", prep_fn)

@jax.jit
def prep_bwd():
    def f(xyz, sc, qu, op, sh_):
        p = proj_ops.preprocess(
            xyz, sc, qu, op, sh_, alive, sh_degree=3,
            world_view=camera["world_view"], full_proj=camera["full_proj"],
            camera_center=camera["camera_center"],
            tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
            width=width, height=height, low_pass=0.3)
        return (jnp.sum(p.xy) + jnp.sum(p.conic) + jnp.sum(p.rgb)
                + jnp.sum(p.depth))
    return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
        state.params.xyz, scales, quats, opac, shs)
timeit("preprocess fwd+bwd", prep_bwd)

@jax.jit
def bin_fn():
    return binning_ops.bin_gaussians(prep, grid_x, grid_y, max_instances)
binn = timeit("binning", bin_fn)

@jax.jit
def gather_bwd():
    def f(xy, conic, opaci, rgb, depth):
        pergauss = jnp.concatenate(
            [xy, conic, opaci[:, None], rgb, depth[:, None]], axis=1)
        pergauss = jnp.concatenate(
            [pergauss, jnp.zeros_like(pergauss[:1])], axis=0)
        return jnp.sum(pergauss[binn.gauss_idx] ** 2)
    return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
        prep.xy, prep.conic, prep.opacity, prep.rgb, prep.depth)
timeit("instance gather fwd+bwd (scatter)", gather_bwd)

@jax.jit
def ssim_bwd():
    def f(img):
        loss, l1 = loss_ops.training_loss(img, gt, 0.2)
        return loss
    return jax.grad(f)(gt * 0.9)
timeit("loss(L1+SSIM) fwd+bwd", ssim_bwd)

# composite bwd split: kernel vs epilogue
pergauss = jnp.concatenate([
    prep.xy, prep.conic, prep.opacity[:, None], prep.rgb,
    prep.depth[:, None]], axis=1)
pergauss = jnp.concatenate([pergauss, jnp.zeros_like(pergauss[:1])], axis=0)
inst = pergauss[binn.gauss_idx]
tid = jnp.minimum(binn.tile_id, grid_x * grid_y - 1)
origin = jnp.stack([tid % grid_x * 16, tid // grid_x * 16],
                   axis=-1).astype(jnp.float32)
xy_local = inst[:, 0:2] - origin

pack = tile_render._pack_padded(xy_local, inst[:, 2:5], inst[:, 5],
                                inst[:, 6:9], inst[:, 9])
tiles = tile_render._composite_fwd_impl(pack, binn.tile_start, binn.tile_end,
                                        interpret=False)
gtile = jnp.ones_like(tiles)
starts, ends = binn.tile_start, binn.tile_end
print("n_tiles:", starts.shape[0], " num_inst:", int(binn.num_instances))

@jax.jit
def bwd_kernel_only(pack, starts, ends, tiles, gtile):
    return tile_render._composite_bwd_impl(
        pack, starts, ends, tiles, gtile, interpret=False)
timeit("composite bwd kernel only", bwd_kernel_only, pack, starts, ends,
       tiles, gtile)

@jax.jit
def bwd_full(pack, starts, ends, tiles, gtile):
    return tile_render._composite_bwd((pack, starts, ends, tiles), gtile)
timeit("composite bwd kernel+epilogue", bwd_full, pack, starts, ends,
       tiles, gtile)

@jax.jit
def fwd_kernel_only(pack, starts, ends):
    return tile_render._composite_fwd_impl(pack, starts, ends,
                                           interpret=False)
timeit("composite fwd kernel only", fwd_kernel_only, pack, starts, ends)

@jax.jit
def pack_only(xy_local, inst):
    return tile_render._pack_padded(xy_local, inst[:, 2:5], inst[:, 5],
                                    inst[:, 6:9], inst[:, 9])
timeit("pack_instances", pack_only, xy_local, inst)
