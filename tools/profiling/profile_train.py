"""Bisect full train_step cost vs its pieces at garden scale."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from rain_tpu.data.cameras import Camera
from rain_tpu.model import adam as adam_mod
from rain_tpu.model import gaussians as gmod
from rain_tpu.model import densify as densify_mod
from rain_tpu.train import step as step_mod
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops import render as render_ops
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
opt = adam_mod.init(state.params)
cam = Camera(uid=0, image_name="bench", R=np.eye(3), T=np.zeros(3),
             fovx=1.0, fovy=0.7, image=None, width=width, height=height)
camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
gt = jnp.asarray(rng.uniform(0, 1, (3, height, width)), jnp.float32)
bg = jnp.zeros((3,), jnp.float32)
opt_leaves = {"feature_lr": 0.0025, "opacity_lr": 0.05,
              "scaling_lr": 0.005, "rotation_lr": 0.001}
alive = gmod.alive_mask(state)
cap = state.capacity

def timeit(name, fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1000:8.2f} ms", flush=True)
    return out

lp = jnp.asarray(0.3, jnp.float32)
xlr = jnp.asarray(1.6e-4, jnp.float32)

# 1. full train_step with stats
timeit("train_step (stats=True)", lambda: step_mod.train_step(
    state, opt, camera, gt, bg, lp, xlr, width=width, height=height,
    sh_degree=3, max_instances=max_instances, opt_cfg_leaves=opt_leaves,
    update_densify_stats=True))

# 2. without stats
timeit("train_step (stats=False)", lambda: step_mod.train_step(
    state, opt, camera, gt, bg, lp, xlr, width=width, height=height,
    sh_degree=3, max_instances=max_instances, opt_cfg_leaves=opt_leaves,
    update_densify_stats=False))

# 3. grad wrt params only, with tap arg present but not differentiated
@jax.jit
def g_params_only(params, gt):
    def loss_fn(params):
        scales, quats, opac, shs = gmod.activate(params)
        out = render_ops.render(
            params.xyz, scales, quats, opac, shs, alive,
            camera=camera, width=width, height=height, sh_degree=3,
            bg=bg, low_pass=lp, max_instances=max_instances)
        loss, l1 = loss_ops.training_loss(out.render, gt, 0.2)
        return loss
    return jax.grad(loss_fn)(params)
timeit("grad wrt params (no tap)", lambda: g_params_only(state.params, gt))

# 4. grad wrt params AND tap
@jax.jit
def g_with_tap(params, gt):
    def loss_fn(params, tap):
        scales, quats, opac, shs = gmod.activate(params)
        out = render_ops.render(
            params.xyz, scales, quats, opac, shs, alive,
            camera=camera, width=width, height=height, sh_degree=3,
            bg=bg, low_pass=lp, max_instances=max_instances, xy_tap=tap)
        loss, l1 = loss_ops.training_loss(out.render, gt, 0.2)
        return loss, l1
    tap0 = jnp.zeros((cap, 2), jnp.float32)
    return jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        params, tap0)
timeit("value_and_grad params+tap", lambda: g_with_tap(state.params, gt))

# 5. adam alone
@jax.jit
def adam_only(params, opt):
    lrs = gmod.GaussianParams(
        xyz=xlr, features_dc=0.0025, features_rest=0.0025 / 20.0,
        scaling=0.005, rotation=0.001, opacity=0.05)
    g = jax.tree.map(jnp.ones_like, params)
    return adam_mod.update(params, g, opt, lrs)
timeit("adam update alone", lambda: adam_only(state.params, opt))
