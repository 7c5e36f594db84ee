"""Per-stage timing with chained iterations inside one jit (fori_loop),
so the tunnel can't memoize and dispatch overhead amortizes."""
import os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from jax import lax
from rain_tpu.data.cameras import Camera
from rain_tpu.model import adam as adam_mod
from rain_tpu.model import gaussians as gmod
from rain_tpu.train import step as step_mod
from rain_tpu.ops import render as render_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 1297, 840
n = 262_144
max_instances = 1_048_576
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
opt = adam_mod.init(state.params)
cam = Camera(uid=0, image_name="bench", R=np.eye(3), T=np.zeros(3),
             fovx=1.0, fovy=0.7, image=None, width=width, height=height)
camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
gt = jnp.asarray(rng.uniform(0, 1, (3, height, width)), jnp.float32)
bg = jnp.zeros((3,), jnp.float32)
opt_cfg = dict(feature_lr=0.0025, opacity_lr=0.05, scaling_lr=0.005,
               rotation_lr=0.001)
grid_x = (width + 15) // 16
grid_y = (height + 15) // 16
alive = gmod.alive_mask(state)
scales, quats, opac, shs = gmod.activate(state.params)

def timeit(name, fn, *args):
    try:
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / K
        print(f"{name:38s} {dt*1000:8.2f} ms/iter", flush=True)
    except Exception:
        traceback.print_exc(); print(f"{name:38s} FAILED", flush=True)

# 1. full train step (chained state)
def full_chain(state, opt):
    def body(i, c):
        st, op = c
        st, op, aux = step_mod.train_step(
            st, op, camera, gt, bg, jnp.float32(0.3), jnp.float32(1.6e-4),
            width=width, height=height, sh_degree=3,
            max_instances=max_instances, opt_cfg_leaves=opt_cfg,
            update_densify_stats=True)
        return (st, op)
    return lax.fori_loop(0, K, body, (state, opt))
timeit("train_step x%d" % K, full_chain, state, opt)

# 2. render fwd (chain: xyz += eps*prev)
def fwd_chain(xyz0):
    def body(i, carry):
        xyz, acc = carry
        out = render_ops.render(xyz, scales, quats, opac, shs, alive,
                                camera=camera, width=width, height=height,
                                sh_degree=3, bg=bg, low_pass=0.3,
                                max_instances=max_instances)
        s = out.render[0, 0, 0]
        return (xyz + 1e-30 * s, acc + s)
    return lax.fori_loop(0, K, body, (xyz0, jnp.float32(0)))
timeit("render fwd x%d" % K, fwd_chain, state.params.xyz)

# 3. loss fwd+bwd
def lg_chain(params):
    def loss_fn(p):
        s, q, o, sh_ = gmod.activate(p)
        out = render_ops.render(p.xyz, s, q, o, sh_, alive,
                                camera=camera, width=width, height=height,
                                sh_degree=3, bg=bg, low_pass=0.3,
                                max_instances=max_instances)
        return loss_ops.training_loss(out.render, gt, 0.2)[0]
    def body(i, p):
        g = jax.grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a + 1e-30 * b, p, g)
    return lax.fori_loop(0, K, body, params)
timeit("loss fwd+bwd x%d" % K, lg_chain, state.params)

# 4. preprocess fwd only
def prep_chain(xyz0):
    def body(i, carry):
        xyz, acc = carry
        prep = proj_ops.preprocess(
            xyz, scales, quats, opac, shs, alive, sh_degree=3,
            world_view=camera["world_view"], full_proj=camera["full_proj"],
            camera_center=camera["camera_center"],
            tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
            width=width, height=height, low_pass=0.3)
        s = prep.depth[0]
        return (xyz + 1e-30 * s, acc + s)
    return lax.fori_loop(0, K, body, (xyz0, jnp.float32(0)))
timeit("preprocess fwd x%d" % K, prep_chain, state.params.xyz)

# precompute prep once for stage-level tests
prep = jax.jit(lambda xyz: proj_ops.preprocess(
    xyz, scales, quats, opac, shs, alive, sh_degree=3,
    world_view=camera["world_view"], full_proj=camera["full_proj"],
    camera_center=camera["camera_center"],
    tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
    width=width, height=height, low_pass=0.3))(state.params.xyz)
jax.block_until_ready(prep)

# 5. binning only (chain via depth)
def bin_chain(depth0):
    def body(i, carry):
        d, acc = carry
        p = prep._replace(depth=d)
        b = binning_ops.bin_gaussians(p, grid_x, grid_y, max_instances)
        s = b.tile_start[0].astype(jnp.float32) + b.rank[0].astype(jnp.float32)
        return (d + 1e-30 * s, acc + s)
    return lax.fori_loop(0, K, body, (prep.depth, jnp.float32(0)))
timeit("binning x%d" % K, bin_chain, prep.depth)

binn = jax.jit(lambda: binning_ops.bin_gaussians(
    prep, grid_x, grid_y, max_instances))()
jax.block_until_ready(binn)
print("num_instances:", int(binn.num_instances), flush=True)

# 6. gather+pack only
def pack_chain(depth0):
    def body(i, carry):
        d, acc = carry
        z = jnp.zeros_like(d)
        table = jnp.stack([
            prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
            prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
            prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
            d, z, z, z, z, z, z], axis=-1)
        table = jnp.concatenate([table, jnp.zeros_like(table[:1])], axis=0)
        pk = table[binn.gauss_idx].T
        s = pk[0, 0]
        return (d + 1e-30 * s, acc + s)
    return lax.fori_loop(0, K, body, (prep.depth, jnp.float32(0)))
timeit("gather+pack x%d" % K, pack_chain, prep.depth)

pack = jax.jit(lambda: tile_render.pack_rows(
    prep.xy, prep.conic, prep.opacity, prep.rgb, prep.depth))()
# per-instance pack through the kernel's canonical row layout
packI = jax.jit(lambda: jnp.concatenate([pack, jnp.zeros((16,1),jnp.float32)],1)[:, binn.gauss_idx])()
jax.block_until_ready(packI)
toff = jnp.asarray([0], jnp.int32)

# 7. composite fwd only
def comp_chain(p0):
    def body(i, carry):
        p, acc = carry
        t = tile_render.composite(p, binn.tile_start, binn.tile_end,
                                  toff, grid_x)
        s = t[0, 0, 0]
        return (p + 1e-30 * s, acc + s)
    return lax.fori_loop(0, K, body, (p0, jnp.float32(0)))
timeit("composite fwd x%d" % K, comp_chain, packI)

# 8. composite fwd+bwd
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

# 9. ssim loss fwd+bwd alone
def ssim_chain(img0):
    def f(img):
        return loss_ops.training_loss(img, gt, 0.2)[0]
    def body(i, im):
        g = jax.grad(f)(im)
        return im + 1e-30 * g
    return lax.fori_loop(0, K, body, img0)
timeit("loss(L1+SSIM) fwd+bwd x%d" % K, ssim_chain, gt * 0.5)
print("done", flush=True)
