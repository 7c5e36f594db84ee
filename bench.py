"""Benchmark: full train-step throughput across garden population tiers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "tiers"}.

Configuration mirrors Mip-NeRF-360 'garden' at images_4 resolution
(1297x840 → padded tile grid 82x53) at three Gaussian-population tiers
spanning the whole training trajectory:

  262k (mid-training, ~0.6M instances, 768k instance tier)   ← headline
  1m   (late-training, ~1.6M instances, 2^21 tier)
  4m   (end-state,     ~5.4M instances, 6.29M tier — the scale the CUDA
        reference reaches on garden, rasterizer_impl.cu:269-310 sizing
        its buffers to num_rendered)

Each tier's instance capacity is the one the Trainer's overflow-doubling
logic settles on (trainer._grow_instances). The step is the real
production path: differentiable preprocess → fused expand + payload sort
→ Pallas tile compositor fwd/bwd → MXU gradient reduction → Adam update.

vs_baseline anchor: the reference CUDA pipeline (diff_gaussian_
rasterization on an NVIDIA A6000, the hardware named in the reference
README) sustains roughly 10 train iters/s on garden at mid-training
population — the repo publishes no numbers (BASELINE.md), so this
external anchor is used as 1.0 for the headline tier.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_ITERS_PER_S = 10.0

# name → (n_gaussians, max_instances, log_scale, timed_iters)
# max_instances = the tier the Trainer's half-step growth ladder
# (trainer._next_instance_tier: 2^k, 3·2^(k-1), ...) settles on for the
# tier's instance count.
TIERS = {
    "262k": (262_144, 786_432, -4.5, 20),
    "1m": (1 << 20, 1 << 21, -5.2, 10),
    "4m": (1 << 22, 6_291_456, -5.9, 6),
}


def run_tier(n, max_instances, log_scale, iters):
    import jax
    import jax.numpy as jnp
    from rain_tpu.data.cameras import Camera
    from rain_tpu.model import adam as adam_mod
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.ops.sh import rgb_to_sh_dc
    from rain_tpu.train import step as step_mod

    width, height = 1297, 840
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-3, 3, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    # build the state directly (fixed log-scales) — the benchmark measures
    # train-step throughput, not point-cloud init
    state = gmod.from_arrays(
        xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
        f_rest=np.zeros((n, 15, 3), np.float32),
        scaling=np.full((n, 3), log_scale, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.full((n, 1), -1.0, np.float32), capacity=n)
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

    # compile + warmup
    state, opt, aux = one(state, opt)
    jax.block_until_ready(state.params.xyz)
    num_instances = int(aux.num_instances)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, opt, aux = one(state, opt)
    jax.block_until_ready(state.params.xyz)
    dt = time.perf_counter() - t0
    return iters / dt, num_instances


def _ensure_tpu():
    """The experimental axon tunnel's backend init fails SILENTLY (falls
    back to CPU) when another process holds or just released the chip;
    the 4m tier would then never finish. Re-exec this process (backend
    init is once-per-process) with a cooldown until the TPU attaches."""
    import jax
    if jax.default_backend() == "tpu" or \
            os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    tries = int(os.environ.get("BENCH_TPU_RETRY", "0"))
    if tries >= 8:
        print(json.dumps({
            "metric": "garden-proxy train step", "value": 0.0,
            "unit": "iters/s", "vs_baseline": 0.0,
            "error": "TPU backend unavailable after 8 attempts "
                     f"(default_backend={jax.default_backend()})"}))
        sys.exit(1)
    os.environ["BENCH_TPU_RETRY"] = str(tries + 1)
    sys.stderr.write(f"[bench] backend={jax.default_backend()}, retrying "
                     f"TPU attach ({tries + 1}/8) in 45s\n")
    time.sleep(45)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    from rain_tpu.cache import enable_compile_cache
    enable_compile_cache()
    _ensure_tpu()
    import jax.numpy as jnp

    # absorb the one-time first-device-to-host-fetch latency of the
    # harness tunnel before timing anything
    _ = float(jnp.zeros(()).block_until_ready())

    width, height = 1297, 840
    tiers = {}
    for name, (n, m, log_scale, iters) in TIERS.items():
        ips, ninst = run_tier(n, m, log_scale, iters)
        tiers[name] = {"gaussians": n, "max_instances": m,
                       "instances": ninst,
                       "iters_per_s": round(ips, 3),
                       # BASELINE.md north-star companions to iters/s
                       "mpixels_per_s_chip": round(
                           ips * width * height / 1e6, 2),
                       "minstances_per_s": round(ips * ninst / 1e6, 2)}

    headline = tiers["262k"]["iters_per_s"]
    print(json.dumps({
        "metric": ("garden-proxy train step (262k gaussians, 1297x840, "
                   "fwd+bwd+adam, 1 chip; tiers key = 262k/1m/4m "
                   "populations)"),
        "value": headline,
        "unit": "iters/s",
        "vs_baseline": round(headline / BASELINE_ITERS_PER_S, 3),
        "tiers": tiers,
    }))


if __name__ == "__main__":
    main()
