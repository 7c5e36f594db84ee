"""Scaling probe: time the full train step at garden end-state tiers.

Usage: python tools/probe_scale.py [tier ...]   (tiers: 262k 1m 4m)

Prints per-tier compile time, step time, and instance stats. Used to find
and fix the binning/sort scaling cliffs before they land in bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

TIERS = {
    "262k": (262_144, 786_432, -4.5),
    "262k-pow2": (262_144, 1 << 20, -4.5),
    "1m": (1 << 20, 1 << 21, -5.2),     # 1.64M instances -> 2^21 tier
    "1m-wide": (1 << 20, 1 << 22, -5.2),
    "4m": (1 << 22, 6_291_456, -5.9),
    "4m-pow2": (1 << 22, 1 << 23, -5.9),
    # SURVEY hard-part #3 headroom probe: 8.4M Gaussians at the 2^24
    # instance tier. MEASURED round 5: RESOURCE_EXHAUSTED on the 16 GB
    # v5e — past the single-chip ceiling (docs/PERF.md), where the
    # sharded mode's per-shard capacities/tiers take over.
    "8m-16minst": (1 << 23, 1 << 24, -5.9),
}


def run_tier(name, n, max_instances, log_scale):
    from rain_tpu.data.cameras import Camera
    from rain_tpu.model import adam as adam_mod
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.ops.sh import rgb_to_sh_dc
    from rain_tpu.train import step as step_mod
    import jax
    import jax.numpy as jnp

    width, height = 1297, 840
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-3, 3, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = gmod.from_arrays(
        xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
        f_rest=np.zeros((n, 15, 3), np.float32),
        scaling=np.full((n, 3), log_scale, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.full((n, 1), -1.0, np.float32), capacity=n)
    opt = adam_mod.init(state.params)
    cam = Camera(uid=0, image_name="probe", R=np.eye(3), T=np.zeros(3),
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

    _ = float(jnp.zeros(()).block_until_ready())
    t0 = time.perf_counter()
    state, opt, aux = one(state, opt)
    jax.block_until_ready(state.params.xyz)
    t_compile = time.perf_counter() - t0
    ninst = int(aux.num_instances)
    ovf = bool(aux.instance_overflow)

    trace_dir = os.environ.get("PROBE_TRACE", "")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, opt, aux = one(state, opt)
    jax.block_until_ready(state.params.xyz)
    dt = (time.perf_counter() - t0) / iters
    if trace_dir:
        jax.profiler.stop_trace()
    print(f"[{name}] n={n} M={max_instances} instances={ninst} "
          f"overflow={ovf} compile={t_compile:.1f}s "
          f"step={dt * 1e3:.2f}ms ({1 / dt:.2f} it/s)", flush=True)


def main():
    from rain_tpu.cache import enable_compile_cache
    enable_compile_cache()
    tiers = sys.argv[1:] or list(TIERS)
    for t in tiers:
        run_tier(t, *TIERS[t])


if __name__ == "__main__":
    main()
