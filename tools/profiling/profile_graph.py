"""Bisect the combined loss-grad graph to find the 150ms phantom."""
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
    print(f"{name:46s} {dt*1000:8.2f} ms", flush=True)
    return out

def full_render(params):
    scales, quats, opac, shs = gmod.activate(params)
    return render_ops.render(
        params.xyz, scales, quats, opac, shs, alive,
        camera=camera, width=width, height=height, sh_degree=3,
        bg=bg, low_pass=lp, max_instances=max_instances)

# A. forward only (loss value)
@jax.jit
def fwd_only(params, gt):
    out = full_render(params)
    loss, _ = loss_ops.training_loss(out.render, gt, 0.2)
    return loss
timeit("A fwd only (loss value)", fwd_only, state.params, gt)

# B. grad of sum of rendered image (no SSIM/L1)
@jax.jit
def g_sumrender(params):
    return jax.grad(lambda p: jnp.sum(full_render(p).render))(params)
timeit("B grad of sum(render)", g_sumrender, state.params)

# C. grad where loss depends on composite output via precomputed
#    instances (isolates composite bwd + upstream VJP minus preprocess)
@jax.jit
def g_skip_prep(params, gt):
    def loss_fn(p):
        scales, quats, opac, shs = gmod.activate(p)
        prep = proj_ops.preprocess(
            jax.lax.stop_gradient(p.xyz),
            jax.lax.stop_gradient(scales), jax.lax.stop_gradient(quats),
            jax.lax.stop_gradient(opac), jax.lax.stop_gradient(shs),
            alive, sh_degree=3,
            world_view=camera["world_view"], full_proj=camera["full_proj"],
            camera_center=camera["camera_center"],
            tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
            width=width, height=height, low_pass=lp)
        # re-inject differentiable leaves through the opacity only
        prep = prep._replace(opacity=jax.nn.sigmoid(p.opacity[:, 0]))
        tiles, num_i, ovf = render_ops.render_tiles(
            prep, None, grid_x=grid_x, grid_y=grid_y, ty0=0, ty1=grid_y,
            max_instances=max_instances)
        img = render_ops.assemble_image(tiles, grid_x, grid_y, height, width)
        color = img[..., 0:3] + img[..., 5:6] * bg[None, None, :]
        loss, _ = loss_ops.training_loss(color.transpose(2, 0, 1), gt, 0.2)
        return loss
    return jax.grad(loss_fn)(params)
timeit("C grad, prep stop-grad (opacity only)", g_skip_prep,
       state.params, gt)

# D. grad of sum of prep outputs (preprocess VJP at full graph)
@jax.jit
def g_prep_only(params):
    def f(p):
        scales, quats, opac, shs = gmod.activate(p)
        prep = proj_ops.preprocess(
            p.xyz, scales, quats, opac, shs, alive, sh_degree=3,
            world_view=camera["world_view"], full_proj=camera["full_proj"],
            camera_center=camera["camera_center"],
            tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
            width=width, height=height, low_pass=lp)
        return (jnp.sum(prep.xy) + jnp.sum(prep.conic) + jnp.sum(prep.rgb)
                + jnp.sum(prep.depth) + jnp.sum(prep.opacity))
    return jax.grad(f)(params)
timeit("D grad of preprocess sums", g_prep_only, state.params)
