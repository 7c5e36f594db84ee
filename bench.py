"""Benchmark: full train-step throughput on a garden-proxy synthetic scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration mirrors Mip-NeRF-360 'garden' at images_4 resolution
(1297x840 → padded tile grid 82x53) with a mid-training-scale Gaussian
population. The step is the real production path: differentiable
preprocess → binning sort → Pallas tile compositor fwd/bwd → Adam update.

vs_baseline anchor: the reference CUDA pipeline (diff_gaussian_rasterization
on an NVIDIA A6000, the hardware named in the reference README) sustains
roughly 10 train iters/s on garden at this population — the repo publishes
no numbers (BASELINE.md), so this external anchor is used as 1.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_ITERS_PER_S = 10.0


def main():
    from rain_tpu.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from rain_tpu.data.cameras import Camera
    from rain_tpu.model import adam as adam_mod
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.train import step as step_mod

    width, height = 1297, 840
    n = 262_144
    cap = n
    # the instance-buffer tier the Trainer's overflow-doubling logic
    # settles on for this scene's ~613k instances (trainer.py:_grow_instances)
    max_instances = 1_048_576

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-3, 3, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    # build the state directly (fixed log-scales) — the benchmark measures
    # train-step throughput, not point-cloud init
    from rain_tpu.ops.sh import rgb_to_sh_dc
    state = gmod.from_arrays(
        xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
        f_rest=np.zeros((n, 15, 3), np.float32),
        scaling=np.full((n, 3), -4.5, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.full((n, 1), -1.0, np.float32), capacity=cap)
    opt = adam_mod.init(state.params)
    cam = Camera(uid=0, image_name="bench", R=np.eye(3), T=np.zeros(3),
                 fovx=1.0, fovy=0.7, image=None, width=width, height=height)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = jnp.asarray(rng.uniform(0, 1, (3, height, width)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    opt_leaves = {"feature_lr": 0.0025, "opacity_lr": 0.05,
                  "scaling_lr": 0.005, "rotation_lr": 0.001}

    def one(state, opt):
        return step_mod.train_step(
            state, opt, camera, gt, bg,
            jnp.asarray(0.3, jnp.float32), jnp.asarray(1.6e-4, jnp.float32),
            width=width, height=height, sh_degree=3,
            max_instances=max_instances, opt_cfg_leaves=opt_leaves,
            update_densify_stats=True)

    # absorb the one-time first-device-to-host-fetch latency of the
    # harness tunnel before timing anything
    _ = float(jnp.zeros(()).block_until_ready())

    # compile + warmup
    state, opt, aux = one(state, opt)
    jax.block_until_ready(state.params.xyz)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, opt, aux = one(state, opt)
    jax.block_until_ready(state.params.xyz)
    dt = time.perf_counter() - t0

    iters_per_s = iters / dt
    print(json.dumps({
        "metric": ("garden-proxy train step (262k gaussians, 1297x840, "
                   "fwd+bwd+adam, 1 chip)"),
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
