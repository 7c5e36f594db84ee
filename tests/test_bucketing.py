"""Resolution bucketing: one compiled step per tile-aligned size bucket.

The reference rasterizer takes H/W as runtime values and pays zero
recompiles across camera sizes (utils/camera_utils.py:8-41); under jit
every distinct (width, height) is a fresh XLA program. The bucketed step
(train.step.train_step real_wh) renders into a tile-aligned bucket and
masks the loss to the true size — these tests pin (a) the masked loss ==
the cropped loss, (b) bucketed step == exact-size step (outputs and
updated parameters), (c) the Trainer compiles once per bucket for a
mixed-size scene.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rain_tpu import config as cfg_mod
from rain_tpu.data.cameras import Camera
from rain_tpu.data.dataset import SceneData
from rain_tpu.model import adam as adam_mod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import losses
from rain_tpu.train import step as step_mod
from rain_tpu.train.trainer import Trainer

OPT_LEAVES = {"feature_lr": 0.0025, "opacity_lr": 0.05,
              "scaling_lr": 0.005, "rotation_lr": 0.001}


def _model(n=160, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-0.6, 0.6, (n, 2)),
                          rng.uniform(3.0, 4.5, (n, 1))],
                         axis=1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    state = gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=n,
                                 knn_window=16)
    return state, adam_mod.init(state.params)


def _camera(w, h, uid=0, ang=0.0, image=None):
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    return Camera(uid=uid, image_name=f"c{uid}", R=R, T=np.zeros(3),
                  fovx=0.9, fovy=0.8, image=image, width=w, height=h)


def test_masked_loss_equals_cropped():
    rng = np.random.default_rng(1)
    h, w, bh, bw = 45, 61, 48, 64
    img = jnp.asarray(rng.uniform(0, 1, (3, bh, bw)), jnp.float32)
    gt = jnp.zeros((3, bh, bw), jnp.float32)
    gt = gt.at[:, :h, :w].set(
        jnp.asarray(rng.uniform(0, 1, (3, h, w)), jnp.float32))
    # (the render also produces live pixels only inside the real region,
    # but masked_training_loss must not rely on that for the image)
    loss_m, l1_m = losses.masked_training_loss(img, gt, w, h)
    loss_c, l1_c = losses.training_loss(img[:, :h, :w], gt[:, :h, :w])
    np.testing.assert_allclose(float(l1_m), float(l1_c), rtol=1e-6)
    np.testing.assert_allclose(float(loss_m), float(loss_c), rtol=1e-6)


def test_bucketed_step_matches_exact_step():
    w, h, bw, bh = 61, 45, 64, 48
    state, opt = _model()
    cam = _camera(w, h)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    rng = np.random.default_rng(2)
    gt = jnp.asarray(rng.uniform(0, 1, (3, h, w)), jnp.float32)
    gt_pad = jnp.zeros((3, bh, bw), jnp.float32).at[:, :h, :w].set(gt)
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    lp = jnp.asarray(0.3, jnp.float32)
    lr = jnp.asarray(1.6e-4, jnp.float32)

    s1, o1, a1 = step_mod.train_step(
        state, opt, camera, gt, bg, lp, lr, width=w, height=h,
        sh_degree=3, max_instances=8192, opt_cfg_leaves=OPT_LEAVES)
    s2, o2, a2 = step_mod.train_step(
        state, opt, camera, gt_pad, bg, lp, lr, width=bw, height=bh,
        sh_degree=3, max_instances=8192, opt_cfg_leaves=OPT_LEAVES,
        real_wh=(jnp.asarray(w, jnp.int32), jnp.asarray(h, jnp.int32)))

    np.testing.assert_allclose(float(a2.loss), float(a1.loss), rtol=1e-6)
    np.testing.assert_allclose(float(a2.l1), float(a1.l1), rtol=1e-6)
    for name, x1, x2 in zip(gmod.GaussianParams._fields,
                            s1.params, s2.params):
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                                   rtol=2e-5, atol=2e-7, err_msg=name)
    # densify stats must use the true size, not the bucket
    np.testing.assert_allclose(np.asarray(s2.xyz_gradient_accum),
                               np.asarray(s1.xyz_gradient_accum),
                               rtol=2e-5, atol=1e-9)


def test_trainer_one_compile_per_bucket(tmp_path):
    """A scene with 3 distinct camera sizes (two sharing one tile bucket)
    runs through the Trainer with exactly 2 bucketed step shapes."""
    rng = np.random.default_rng(3)
    sizes = [(61, 45), (64, 47), (126, 89)]   # buckets: 64x48, 64x48, 128x96
    cams = []
    for i, (w, h) in enumerate(sizes * 2):
        img = rng.uniform(0.2, 0.8, (3, h, w)).astype(np.float32)
        cams.append(_camera(w, h, uid=i, ang=0.05 * i, image=img))
    pts = np.concatenate([rng.uniform(-0.5, 0.5, (100, 2)),
                          rng.uniform(3.0, 4.0, (100, 1))],
                         axis=1).astype(np.float32)
    scene = SceneData(train_cameras=cams, test_cameras=[],
                      points=pts,
                      colors=rng.uniform(0, 1, (100, 3)).astype(np.float32),
                      nerf_radius=2.0, nerf_translate=np.zeros(3))
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    cfgs["opt"] = dataclasses.replace(cfgs["opt"], iterations=8,
                                      densify_from_iter=10 ** 9)
    cfgs["system"] = dataclasses.replace(cfgs["system"], capacity=128,
                                         max_instances=8192, log_every=4)
    trainer = Trainer(scene, cfgs, str(tmp_path / "out"),
                      tensorboard=False, log_fn=lambda *a: None)
    assert trainer._bucketed
    trainer.train(iterations=8, test_iterations=(), save_iterations=())
    assert trainer._bucket_keys == {(64, 48), (128, 96)}
    v = trainer.flush_pending()
    assert np.isfinite(v.loss)
