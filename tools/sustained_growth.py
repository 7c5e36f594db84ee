"""Capacity-growth stress: drive the Trainer to multi-million alive.

NOT the production schedule (opacity resets are disabled): this run's
purpose is SURVEY hard-part #2/#3 evidence — sustained densification
through many capacity/tier re-jit boundaries to millions of alive
Gaussians and >10M instances, at the user-facing Trainer rate. An
unfittable noise target keeps screen-space gradients above the densify
threshold indefinitely, so growth runs as fast as the schedule allows.

python -u tools/sustained_growth.py [iters] [out_dir]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from rain_tpu.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    assert jax.default_backend() == "tpu", jax.default_backend()
    from rain_tpu import config as cfg_mod
    from rain_tpu.data.cameras import Camera
    from rain_tpu.data.dataset import SceneData
    from rain_tpu.train.trainer import Trainer
    import jax.numpy as jnp

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3600
    out = sys.argv[2] if len(sys.argv) > 2 else "output/sustained_growth"
    width, height = 1297, 840
    n = 262_144
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-3, 3, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    img = rng.uniform(0, 1, (3, height, width)).astype(np.float32)
    cams = []
    for i in range(4):
        ang = (i - 2) * 0.04
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        cams.append(Camera(uid=i, image_name=f"c{i}", R=R, T=np.zeros(3),
                           fovx=1.0, fovy=0.7, image=img, width=width,
                           height=height))
    scene = SceneData(train_cameras=cams, test_cameras=[], points=pts,
                      colors=cols, nerf_radius=5.0,
                      nerf_translate=np.zeros(3))
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    cfgs["opt"] = dataclasses.replace(
        cfgs["opt"], iterations=iters, densify_from_iter=500,
        densify_until_iter=10 ** 9, opacity_reset_interval=10 ** 9)
    cfgs["system"] = dataclasses.replace(
        cfgs["system"], capacity=n, max_instances=1 << 20, log_every=50,
        # measured single-chip ceiling (round 5): the pipelined Trainer
        # holds TWO state generations for overflow rollback, so capacity
        # 4.19M OOMs at compile (16.10 of 15.75 GB HBM); 2.5M capacity +
        # the ~4-6M instance tiers it implies fits with margin. Larger
        # populations are the sharded mode's job (per-shard capacity AND
        # tier, parallel/sharding.py).
        max_capacity=2_500_000)
    trainer = Trainer(scene, cfgs, out, tensorboard=False)
    trainer.state = trainer.state._replace(
        params=trainer.state.params._replace(
            scaling=jnp.full((n, 3), -4.5, jnp.float32)))
    t0 = time.time()
    trainer.train(iterations=iters, test_iterations=(), save_iterations=())
    dt = time.time() - t0
    print(f"[growth] {iters} iters in {dt / 60:.1f} min "
          f"({iters / dt:.2f} it/s sustained incl. all re-jits); final "
          f"alive {int(trainer.state.n_alive)} capacity "
          f"{trainer.state.capacity} instance tier {trainer.max_instances}",
          flush=True)


if __name__ == "__main__":
    main()
