"""Composite fwd / fwd+bwd at garden scale (CHUNK A/B via RAIN_TPU_CHUNK)."""
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
from rain_tpu.ops import tile_render
from rain_tpu.ops.sh import rgb_to_sh_dc

print("CHUNK =", tile_render.CHUNK, flush=True)
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
alive = gmod.alive_mask(state)
scales, quats, opac, shs = gmod.activate(state.params)
prep = jax.jit(lambda xyz: proj_ops.preprocess(
    xyz, scales, quats, opac, shs, alive, sh_degree=3,
    world_view=camera["world_view"], full_proj=camera["full_proj"],
    camera_center=camera["camera_center"],
    tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
    width=width, height=height, low_pass=0.3))(state.params.xyz)
binn = jax.jit(lambda: binning_ops.bin_gaussians(prep, grid_x, grid_y, M))()
jax.block_until_ready(binn)

z = jnp.zeros_like(prep.depth)
table = jnp.stack([
    prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
    prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
    prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
    prep.depth, z, z, z, z, z, z], axis=0)
table = jnp.concatenate([table, jnp.zeros_like(table[:, :1])], axis=1)
packI = jax.jit(lambda: jnp.take(table, binn.gauss_idx, axis=1))()
jax.block_until_ready(packI)
toff = jnp.asarray([0], jnp.int32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:34s} {dt*1000:8.2f} ms/iter", flush=True)
    return out


def comp_chain(p0):
    def body(i, carry):
        p, acc = carry
        t = tile_render.composite(p, binn.tile_start, binn.tile_end,
                                  toff, grid_x)
        s = t[0, 0, 0]
        return (p + 1e-30 * s, acc + s)
    return lax.fori_loop(0, K, body, (p0, jnp.float32(0)))
timeit("composite fwd x%d" % K, comp_chain, packI)


def compg_chain(p0):
    def f(p):
        t = tile_render.composite(p, binn.tile_start, binn.tile_end,
                                  toff, grid_x)
        return jnp.sum(t[..., 0:3]) + jnp.sum(t[..., 5])
    def body(i, p):
        g = jax.grad(f)(p)
        return p + 1e-30 * g
    return lax.fori_loop(0, K, body, p0)
timeit("composite fwd+bwd x%d" % K, compg_chain, packI)
print("done", flush=True)
