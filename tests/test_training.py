"""End-to-end training smoke tests on synthetic scenes (CPU)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from rain_tpu import config as cfg_mod
from rain_tpu.data import ply as ply_io
from rain_tpu.data.cameras import Camera
from rain_tpu.data.dataset import SceneData
from rain_tpu.ops import losses
from rain_tpu.train.trainer import Trainer


def _make_scene(n_cams=6, n_pts=120, size=48, seed=0):
    """A toy scene: ground-truth Gaussians rendered from a ring of cameras
    gives the 'dataset'; the trainer must fit a fresh model to it."""
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.ops import render as render_ops

    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-0.6, 0.6, (n_pts, 2)),
                          rng.uniform(3.0, 4.5, (n_pts, 1))],
                         axis=1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n_pts, 3)).astype(np.float32)
    gt_state = gmod.create_from_pcd(pts, cols, sh_degree=3,
                                    capacity=n_pts, knn_window=16)
    scales, quats, opac, shs = gmod.activate(gt_state.params)

    cams = []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 0.06
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        cam = Camera(uid=i, image_name=f"c{i}", R=R, T=np.zeros(3),
                     fovx=0.9, fovy=0.9, image=None, width=size,
                     height=size)
        ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
        out = render_ops.render(
            gt_state.params.xyz, scales, quats, opac, shs,
            gmod.alive_mask(gt_state), camera=ci, width=size, height=size,
            sh_degree=3, bg=jnp.zeros(3, jnp.float32), max_instances=4096)
        cam.image = np.asarray(jnp.clip(out.render, 0, 1))
        cams.append(cam)
    # noisy init points near the truth
    init_pts = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    init_cols = np.clip(cols + rng.normal(0, 0.2, cols.shape),
                        0, 1).astype(np.float32)
    return SceneData(train_cameras=cams[:-1], test_cameras=cams[-1:],
                     points=init_pts, colors=init_cols,
                     nerf_radius=2.0, nerf_translate=np.zeros(3))


@pytest.fixture(scope="module")
def toy_scene():
    return _make_scene()


def test_trainer_improves_psnr(toy_scene, tmp_path):
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    import dataclasses
    cfgs["opt"] = dataclasses.replace(
        cfgs["opt"], iterations=60, densify_from_iter=10,
        densification_interval=25, densify_until_iter=50,
        opacity_reset_interval=10_000)
    cfgs["system"] = dataclasses.replace(
        cfgs["system"], capacity=512, max_instances=8192)

    trainer = Trainer(toy_scene, cfgs, str(tmp_path / "out"),
                      log_fn=lambda *a: None)
    r0 = trainer.report(0)
    trainer.train(iterations=60, test_iterations=(),
                  save_iterations=(60,), checkpoint_iterations=(30,))
    r1 = trainer.report(60)
    assert r1["test"]["psnr"] > r0["test"]["psnr"] + 2.0, (r0, r1)

    # artifacts: PLY snapshot + checkpoint written
    ply = tmp_path / "out" / "point_cloud" / "iteration_60" / \
        "point_cloud.ply"
    assert ply.exists()
    pts, _, _ = None, None, None
    d = ply_io.read_gaussians(ply, max_sh_degree=3)
    assert d["xyz"].shape[0] == int(trainer.state.n_alive)
    assert (tmp_path / "out" / "chkpnt30.npz").exists()


def test_trainer_resume(toy_scene, tmp_path):
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    import dataclasses
    cfgs["opt"] = dataclasses.replace(cfgs["opt"], iterations=20,
                                      densify_from_iter=1000)
    cfgs["system"] = dataclasses.replace(
        cfgs["system"], capacity=256, max_instances=8192)
    trainer = Trainer(toy_scene, cfgs, str(tmp_path / "o1"),
                      log_fn=lambda *a: None)
    trainer.train(iterations=10, test_iterations=(), save_iterations=(),
                  checkpoint_iterations=(10,))
    ck = tmp_path / "o1" / "chkpnt10.npz"
    assert ck.exists()

    trainer2 = Trainer(toy_scene, cfgs, str(tmp_path / "o2"),
                       log_fn=lambda *a: None)
    trainer2.train(iterations=20, test_iterations=(), save_iterations=(),
                   start_checkpoint=str(ck))
    assert trainer2.iteration == 20


def test_trainer_profile_steps(toy_scene, tmp_path):
    """--profile_steps A-B captures a jax.profiler trace (SURVEY §5-A:
    the TPU-rich counterpart of the reference's iter_time-only timing)."""
    import dataclasses
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    cfgs["opt"] = dataclasses.replace(cfgs["opt"], iterations=4,
                                      densify_from_iter=10_000)
    cfgs["system"] = dataclasses.replace(
        cfgs["system"], capacity=256, max_instances=4096,
        profile_steps="2-3")
    trainer = Trainer(toy_scene, cfgs, str(tmp_path / "prof"),
                      log_fn=lambda *a: None, tensorboard=False)
    trainer.train(iterations=4, test_iterations=(), save_iterations=())
    traces = list((tmp_path / "prof" / "profile").rglob("*.xplane.pb"))
    assert traces, "no xplane trace captured"


def test_pipelined_verification_matches_sync(toy_scene, tmp_path):
    """system.pipeline=1 (one-step-lag overflow/NaN verification with
    rollback+replay) must produce bit-identical training to synchronous
    per-step verification — including across an instance-tier overflow
    retry (max_instances starts deliberately too small)."""
    import dataclasses

    def run(pipeline, out):
        parser = cfg_mod.build_parser("t")
        cfgs = cfg_mod.extract_all(parser.parse_args([]))
        cfgs["opt"] = dataclasses.replace(
            cfgs["opt"], iterations=12, densify_from_iter=4,
            densification_interval=6, densify_until_iter=40,
            opacity_reset_interval=10_000)
        cfgs["system"] = dataclasses.replace(
            cfgs["system"], capacity=512, max_instances=512,
            pipeline=pipeline, log_every=5)
        tr = Trainer(toy_scene, cfgs, str(tmp_path / out),
                     log_fn=lambda *a: None, tensorboard=False)
        tr.train(iterations=12, test_iterations=(), save_iterations=())
        return tr

    t_sync = run(0, "sync")
    t_pipe = run(1, "pipe")
    # the too-small tier must actually have forced growth
    assert t_sync.max_instances > 512
    assert t_pipe.max_instances == t_sync.max_instances
    assert int(t_pipe.state.n_alive) == int(t_sync.state.n_alive)
    for name, a, b in zip(t_pipe.state.params._fields,
                          t_pipe.state.params, t_sync.state.params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
