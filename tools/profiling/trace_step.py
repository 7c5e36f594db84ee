"""Capture a jax.profiler device trace of the bench train step and print
the top HLO ops by self time (parsed from the xplane protobuf)."""
import glob
import os
import sys
import time

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
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 1297, 840
n = 262_144
max_instances = 1_048_576
rng = np.random.default_rng(0)
pts = np.concatenate([rng.uniform(-3, 3, (n, 2)),
                      rng.uniform(2.0, 12.0, (n, 1))],
                     axis=1).astype(np.float32)
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


def one(state, opt):
    return step_mod.train_step(
        state, opt, camera, gt, bg,
        jnp.asarray(0.3, jnp.float32), jnp.asarray(1.6e-4, jnp.float32),
        width=width, height=height, sh_degree=3,
        max_instances=max_instances, opt_cfg_leaves=opt_cfg,
        update_densify_stats=True)


state, opt, aux = one(state, opt)
jax.block_until_ready(state.params.xyz)

logdir = "/tmp/jaxtrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(5):
        state, opt, aux = one(state, opt)
    jax.block_until_ready(state.params.xyz)

t0 = time.perf_counter()
for _ in range(10):
    state, opt, aux = one(state, opt)
jax.block_until_ready(state.params.xyz)
print("step: %.2f ms" % ((time.perf_counter() - t0) / 10 * 1000), flush=True)

# ---- parse the xplane pb ----
paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, flush=True)
if paths:
    from tensorboard_plugin_profile.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0) + ev.duration_ps
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:48]
        print(f"== plane: {plane.name} (lines: {len(plane.lines)}) ==")
        for name, ps in top:
            print(f"{ps/1e9/5:10.3f} ms  {name[:110]}")
        break
print("done", flush=True)
