"""Worker process for the multi-host smoke test (test_multihost.py).

Runs as one of two localhost processes: brings up jax.distributed via
parallel.distributed.initialize_from_env, builds the GLOBAL 8-device mesh
(2 processes x 4 virtual CPU devices), runs real sharded train steps on
it, and writes its results to a JSON file for the pytest process to check.

Usage: python multihost_worker.py <coord_port> <process_id> <out_json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    port, pid, out_json = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()
    os.environ["RAIN_TPU_COORDINATOR"] = f"localhost:{port}"
    os.environ["RAIN_TPU_NUM_PROCESSES"] = "2"
    os.environ["RAIN_TPU_PROCESS_ID"] = str(pid)

    import jax
    # the axon plugin's sitecustomize force-sets jax_platforms; re-assert
    # CPU before any backend initializes (same workaround as conftest)
    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    from rain_tpu.parallel.distributed import initialize_from_env

    assert initialize_from_env(), "distributed init did not engage"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8, "global mesh must span both processes"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from rain_tpu.data.cameras import Camera
    from rain_tpu.model import adam as adam_mod
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.parallel import sharding

    # identical deterministic inputs on both processes (replicated over
    # the global mesh with an explicit device_put — the multi-controller
    # contract for replicated data)
    width, height = 64, 128          # 8 tile rows -> 1 row per device
    n = 512
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-0.8, 0.8, (n, 2)), rng.uniform(2.5, 5.0, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    state = gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=n,
                                 knn_window=16)
    opt = adam_mod.init(state.params)
    cam = Camera(uid=0, image_name="mh", R=np.eye(3), T=np.zeros(3),
                 fovx=0.9, fovy=1.2, image=None, width=width, height=height)
    gt = rng.uniform(0, 1, (3, height, width)).astype(np.float32)

    mesh = sharding.make_mesh(8)
    rep = NamedSharding(mesh, PS())

    def put(x):
        return jax.device_put(jnp.asarray(x), rep)

    state = jax.tree.map(put, state)
    opt = jax.tree.map(put, opt)
    camera = {k: put(v) for k, v in cam.render_inputs().items()}
    gt = put(gt)
    bg = put(np.zeros(3, np.float32))
    low_pass = put(np.float32(0.3))
    xyz_lr = put(np.float32(1.6e-4))
    opt_leaves = {"feature_lr": 0.0025, "opacity_lr": 0.05,
                  "scaling_lr": 0.005, "rotation_lr": 0.001}

    step = sharding.make_sharded_train_step(
        mesh, width=width, height=height, sh_degree=3,
        max_instances_per_shard=8192)
    losses = []
    for _ in range(3):
        state, opt, aux = step(state, opt, camera, gt, bg, low_pass,
                               xyz_lr, opt_leaves)
        losses.append(float(aux.loss))
        assert not bool(aux.instance_overflow)

    assert np.all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], "optimization must reduce the loss"

    with open(out_json, "w") as f:
        json.dump({"pid": pid, "losses": losses,
                   "xyz0": np.asarray(state.params.xyz[:4]).tolist()}, f)
    print(f"[worker {pid}] ok losses={losses}")


if __name__ == "__main__":
    main()
