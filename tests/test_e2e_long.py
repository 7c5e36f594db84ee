"""Long-run end-to-end validation (BASELINE config #2 class).

Trains a fresh model against renders of a held-out ground-truth Gaussian
scene for thousands of iterations with the full production schedule:
densification growing the population >=10x, at least one capacity re-jit
(trainer._maybe_grow) and an opacity reset mid-run, then asserts PSNR
against the oracle images (reference protocol train.py:179-224).

Gated behind RAIN_TPU_RUN_SLOW=1 — ~2 min compiled on a TPU chip,
~10 min in CPU interpret mode:

  RAIN_TPU_RUN_SLOW=1 python -m pytest tests/test_e2e_long.py -q -s
  RAIN_TPU_RUN_SLOW=1 RAIN_TPU_TEST_PLATFORM=axon \
      python -m pytest tests/test_e2e_long.py -q -s     # on the chip
"""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from rain_tpu import config as cfg_mod
from rain_tpu.data.cameras import Camera
from rain_tpu.data.dataset import SceneData
from rain_tpu.train.trainer import Trainer

pytestmark = pytest.mark.skipif(
    os.environ.get("RAIN_TPU_RUN_SLOW") != "1",
    reason="long run; set RAIN_TPU_RUN_SLOW=1")


def _gt_scene(n_gauss=2000, n_cams=30, size=96, seed=3):
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.ops import render as render_ops

    rng = np.random.default_rng(seed)
    # clustered structure (harder than uniform noise): a few blobs
    centers = rng.uniform(-0.8, 0.8, (12, 3)) * np.array([1, 1, 0.3]) + \
        np.array([0, 0, 3.8])
    idx = rng.integers(0, len(centers), n_gauss)
    pts = (centers[idx] +
           rng.normal(0, 0.12, (n_gauss, 3))).astype(np.float32)
    cols = rng.uniform(0.05, 0.95, (n_gauss, 3)).astype(np.float32)
    gt_state = gmod.create_from_pcd(pts, cols, sh_degree=3,
                                    capacity=n_gauss, knn_window=32)
    scales, quats, opac, shs = gmod.activate(gt_state.params)

    cams = []
    for i in range(n_cams):
        ang = (i / n_cams - 0.5) * 0.8
        tilt = 0.15 * np.sin(i * 2.3)
        Ry = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        Rx = np.array([[1, 0, 0], [0, np.cos(tilt), -np.sin(tilt)],
                       [0, np.sin(tilt), np.cos(tilt)]])
        cam = Camera(uid=i, image_name=f"c{i}", R=Ry @ Rx, T=np.zeros(3),
                     fovx=0.9, fovy=0.9, image=None, width=size,
                     height=size)
        ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
        out = render_ops.render(
            gt_state.params.xyz, scales, quats, opac, shs,
            gmod.alive_mask(gt_state), camera=ci, width=size, height=size,
            sh_degree=3, bg=jnp.zeros(3, jnp.float32), max_instances=65536)
        cam.image = np.asarray(jnp.clip(out.render, 0, 1))
        cams.append(cam)

    # sparse noisy init: forces heavy densification to recover detail
    sel = rng.choice(n_gauss, 150, replace=False)
    init_pts = (pts[sel] +
                rng.normal(0, 0.1, (150, 3))).astype(np.float32)
    init_cols = np.clip(cols[sel] + rng.normal(0, 0.25, (150, 3)),
                        0, 1).astype(np.float32)
    return SceneData(train_cameras=cams[:-3], test_cameras=cams[-3:],
                     points=init_pts, colors=init_cols,
                     nerf_radius=2.0, nerf_translate=np.zeros(3))


def test_long_training_run(tmp_path):
    scene = _gt_scene()
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    iters = int(os.environ.get("RAIN_TPU_E2E_ITERS", "2500"))
    cfgs["opt"] = dataclasses.replace(
        cfgs["opt"], iterations=iters, densify_from_iter=300,
        densification_interval=100, densify_until_iter=iters - 500,
        opacity_reset_interval=1200)
    # capacity 512 with 150 init points → must re-jit grow within the run
    cfgs["system"] = dataclasses.replace(
        cfgs["system"], capacity=512, max_instances=131072, log_every=100)

    grow_events = []
    logs = []

    def log(msg, *a):
        s = str(msg)
        logs.append(s)
        if "[cap]" in s:
            grow_events.append(s)
        print(s)

    trainer = Trainer(scene, cfgs, str(tmp_path / "out"), log_fn=log,
                      tensorboard=False)
    r0 = trainer.report(0)
    trainer.train(iterations=iters, test_iterations=(iters,),
                  save_iterations=(iters,))

    n_final = int(trainer.state.n_alive)
    r1 = trainer.history[-1]
    print(f"final population {n_final} (from 150); "
          f"capacity {trainer.state.capacity}; "
          f"test PSNR {r0['test']['psnr']:.2f} -> {r1['test']['psnr']:.2f}")

    assert n_final >= 1500, n_final          # >=10x growth
    assert trainer.state.capacity > 512      # at least one re-jit growth
    assert any("growing capacity" in s for s in grow_events), grow_events
    assert r1["test"]["psnr"] > 26.0, (r0, r1)
    assert r1["test"]["psnr"] > r0["test"]["psnr"] + 8.0
