"""Cross-check: compiled TPU compositor vs CPU interpret mode, small scene.

Validates the DMA/carry semantics of the compiled kernels that the
interpret-mode tests can't: runs the same packed instance stream through
_composite_fwd_impl/_composite_bwd_impl with interpret=False (TPU) and
compares against the interpret=True result computed on the same arrays.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from rain_tpu.data.cameras import Camera
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 96, 64          # 6x4 tile grid
n = 600
max_instances = 4096
rng = np.random.default_rng(7)
pts = np.concatenate([rng.uniform(-1.5, 1.5, (n, 2)),
                      rng.uniform(2.0, 8.0, (n, 1))], axis=1).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
state = gmod.from_arrays(
    xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
    f_rest=np.zeros((n, 15, 3), np.float32),
    scaling=rng.uniform(-3.5, -2.0, (n, 3)).astype(np.float32),
    rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
    opacity=rng.uniform(-1.0, 2.0, (n, 1)).astype(np.float32), capacity=n)
cam = Camera(uid=0, image_name="chk", R=np.eye(3), T=np.zeros(3),
             fovx=0.9, fovy=0.62, image=None, width=width, height=height)
camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
alive = gmod.alive_mask(state)
scales, quats, opac, shs = gmod.activate(state.params)
grid_x, grid_y = (width + 15) // 16, (height + 15) // 16

prep = proj_ops.preprocess(
    state.params.xyz, scales, quats, opac, shs, alive, sh_degree=3,
    world_view=camera["world_view"], full_proj=camera["full_proj"],
    camera_center=camera["camera_center"],
    tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
    width=width, height=height, low_pass=0.3)
binn = binning_ops.bin_gaussians(prep, grid_x, grid_y, max_instances)
print("num_instances:", int(binn.num_instances), "tiles:", grid_x * grid_y)

z = jnp.zeros_like(prep.depth)
table = jnp.stack([
    prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
    prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
    prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
    prep.depth, z, z, z, z, z, z], axis=-1)
table = jnp.concatenate([table, jnp.zeros_like(table[:1])], axis=0)
pack = table[binn.gauss_idx].T
starts, ends = binn.tile_start, binn.tile_end
toff = jnp.zeros((1,), jnp.int32)

t_tpu = tile_render._composite_fwd_impl(pack, starts, ends, toff,
                                        grid_x=grid_x, interpret=False)
t_int = tile_render._composite_fwd_impl(pack, starts, ends, toff,
                                        grid_x=grid_x, interpret=True)
d = jnp.max(jnp.abs(t_tpu - t_int))
print("fwd  max|tpu - interpret| =", float(d))
assert d < 5e-4, d

gtile = jax.random.normal(jax.random.PRNGKey(0), t_tpu.shape,
                          jnp.float32) * 0.1
g_tpu = tile_render._composite_bwd_impl(pack, starts, ends, toff, t_tpu,
                                        gtile, grid_x=grid_x,
                                        interpret=False)
g_int = tile_render._composite_bwd_impl(pack, starts, ends, toff, t_int,
                                        gtile, grid_x=grid_x,
                                        interpret=True)
m = int(binn.num_instances)
db = jnp.max(jnp.abs(g_tpu[:, :m] - g_int[:, :m]))
scale = jnp.max(jnp.abs(g_int[:, :m])) + 1e-8
print("bwd  max|tpu - interpret| =", float(db), " (max mag",
      float(scale), ")")
assert db / scale < 1e-3, (db, scale)
print("TPU parity OK")
