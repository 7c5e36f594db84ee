"""Sustained Trainer-loop throughput at the garden-proxy scale.

Measures the REAL user-facing training rate (host scheduling + per-step
overflow/NaN fetch + dispatch) against bench.py's back-to-back device
steps, on a full-resolution synthetic scene.

python tools/profiling/trainer_sustained.py [iters]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402


def main():
    from rain_tpu.cache import enable_compile_cache
    enable_compile_cache()
    from rain_tpu import config as cfg_mod
    from rain_tpu.data.cameras import Camera
    from rain_tpu.data.dataset import SceneData
    from rain_tpu.train.trainer import Trainer

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    pipeline = int(os.environ.get("SUSTAINED_PIPELINE", "1"))
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
    # densify off by default: measure steady-state step rate, not re-jit
    # boundaries; SUSTAINED_DENSIFY=1 runs the full production schedule
    # (tier growth + recompiles included in the reported rate)
    densify_from = 500 if os.environ.get("SUSTAINED_DENSIFY") == "1" \
        else 10 ** 9
    cfgs["opt"] = dataclasses.replace(cfgs["opt"], iterations=iters,
                                      densify_from_iter=densify_from)
    cfgs["system"] = dataclasses.replace(
        cfgs["system"], capacity=n, max_instances=1 << 20, log_every=50,
        pipeline=pipeline)
    trainer = Trainer(scene, cfgs, "/tmp/sustained_out",
                      tensorboard=False)
    # bench-comparable splat sizes (create_from_pcd's knn scales on this
    # uniform cloud produce ~10x the bench scene's instance count)
    import jax.numpy as jnp
    trainer.state = trainer.state._replace(params=trainer.state.params._replace(
        scaling=jnp.full((n, 3), -4.5, jnp.float32)))

    # one step to absorb compile, then time the loop
    trainer.train(iterations=1, test_iterations=(), save_iterations=())
    t0 = time.time()
    trainer.train(iterations=iters, test_iterations=(), save_iterations=())
    dt = time.time() - t0
    print(f"sustained: {iters / dt:.2f} it/s over {iters} "
          f"Trainer iterations (vs bench.py device-only rate)")


if __name__ == "__main__":
    main()
