"""Scaling-efficiency measurement for the sharded train step.

Sweeps mesh sizes 1..N on whatever devices are visible (real chips, or
the virtual CPU mesh under --xla_force_host_platform_device_count) and
reports train-step throughput in steps/s and Mpixels/s, plus scaling
efficiency vs the 1-device run (BASELINE north star: ≥0.8). On the
virtual CPU mesh the numbers exercise the *logic* (band partitioning,
psum'd grads/stats, per-shard binning) — wall-clock efficiency there is
bounded by host cores, so treat sub-1.0 CPU numbers as a smoke signal,
not a hardware measurement.
"""

from __future__ import annotations

import time

import numpy as np


def scaling_sweep(device_counts, *, width=256, height=256,
                  n_gaussians=8_000, iters=4, log_fn=print):
    """Times the full sharded train step at each mesh size.

    Returns a list of dicts: {n_dev, steps_per_s, mpix_per_s,
    efficiency} (efficiency = throughput / (n_dev * throughput_1dev)).
    """
    import jax
    import jax.numpy as jnp
    from rain_tpu.data.cameras import Camera
    from rain_tpu.model import adam as adam_mod
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.parallel import sharding

    rng = np.random.default_rng(0)
    n = n_gaussians
    pts = np.concatenate([rng.uniform(-1.2, 1.2, (n, 2)),
                          rng.uniform(2.5, 8.0, (n, 1))],
                         axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=n,
                                 knn_window=32)
    opt = adam_mod.init(state.params)
    cam = Camera(uid=0, image_name="sweep", R=np.eye(3), T=np.zeros(3),
                 fovx=0.9, fovy=0.9, image=None, width=width, height=height)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = jnp.asarray(rng.uniform(0, 1, (3, height, width)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    low_pass = jnp.asarray(0.3, jnp.float32)
    xyz_lr = jnp.asarray(1.6e-4, jnp.float32)
    opt_leaves = {"feature_lr": 0.0025, "opacity_lr": 0.05,
                  "scaling_lr": 0.005, "rotation_lr": 0.001}

    results = []
    base = None
    for n_dev in device_counts:
        if n_dev > len(jax.devices()):
            log_fn(f"[sweep] skipping {n_dev} devices "
                   f"(only {len(jax.devices())} visible)")
            continue
        mesh = sharding.make_mesh(n_dev)
        # per-shard tier shrinks with the mesh: each shard bins only its
        # band (2x slack for uneven bands)
        tier = max(1_048_576 // n_dev, 32768)
        step = sharding.make_sharded_train_step(
            mesh, width=width, height=height, sh_degree=3,
            max_instances_per_shard=tier)
        s, o, aux = step(state, opt, camera, gt, bg, low_pass, xyz_lr,
                         opt_leaves)
        jax.block_until_ready(s.params.xyz)
        assert not bool(aux.instance_overflow), int(aux.num_instances)
        t0 = time.perf_counter()
        for _ in range(iters):
            s, o, aux = step(s, o, camera, gt, bg, low_pass, xyz_lr,
                             opt_leaves)
        jax.block_until_ready(s.params.xyz)
        dt = (time.perf_counter() - t0) / iters
        steps_per_s = 1.0 / dt
        mpix = width * height * steps_per_s / 1e6
        if base is None:
            base = steps_per_s
        eff = steps_per_s / (base * n_dev / device_counts[0])
        results.append({"n_dev": n_dev, "steps_per_s": round(steps_per_s, 3),
                        "mpix_per_s": round(mpix, 3),
                        "efficiency": round(eff, 3)})
        log_fn(f"[sweep] {n_dev} dev: {steps_per_s:.2f} steps/s "
               f"({mpix:.1f} Mpix/s), efficiency {eff:.2f}")
    return results
