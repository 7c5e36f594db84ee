"""Breakdown with per-call block_until_ready (tunnel-safe)."""
import os, sys, time, traceback
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
from rain_tpu.train import step as step_mod
from rain_tpu.ops import render as render_ops
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 1297, 840
n = 262_144
max_instances = 1_048_576
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

def timeit(name, fn, reps=10):
    try:
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn())
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:35s} {dt*1000:8.2f} ms", flush=True)
        return out
    except Exception:
        traceback.print_exc()
        print(f"{name:35s} FAILED", flush=True)

full = lambda: step_mod.train_step(
    state, opt, camera, gt, bg, jnp.float32(0.3), jnp.float32(1.6e-4),
    width=width, height=height, sh_degree=3, max_instances=max_instances,
    opt_cfg_leaves=opt_cfg, update_densify_stats=True)
timeit("train_step (fwd+bwd+adam+stats)", full)

alive = gmod.alive_mask(state)
@jax.jit
def render_fwd():
    s, q, o, sh_ = gmod.activate(state.params)
    return render_ops.render(
        state.params.xyz, s, q, o, sh_, alive, camera=camera,
        width=width, height=height, sh_degree=3, bg=bg, low_pass=0.3,
        max_instances=max_instances)
timeit("render fwd (end to end)", render_fwd)

@jax.jit
def loss_grad():
    def loss_fn(params):
        s, q, o, sh_ = gmod.activate(params)
        out = render_ops.render(params.xyz, s, q, o, sh_, alive,
                                camera=camera, width=width, height=height,
                                sh_degree=3, bg=bg, low_pass=0.3,
                                max_instances=max_instances)
        loss, l1 = loss_ops.training_loss(out.render, gt, 0.2)
        return loss
    return jax.grad(loss_fn)(state.params)
timeit("loss fwd+bwd (no adam/tap)", loss_grad)
print("done", flush=True)
