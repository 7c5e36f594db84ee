"""Multi-chip parity: the sharded train step (tile-row bands, psum'd
grads + densify stats) must reproduce the single-chip step exactly, and
the Trainer's sharded mode must track the single-chip Trainer through
densification."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rain_tpu.model import adam as amod
from rain_tpu.model import gaussians as gmod
from rain_tpu.parallel import sharding
from rain_tpu.train import step as step_mod
from tests.conftest import make_camera

OPT_LEAVES = {"feature_lr": 0.0025, "opacity_lr": 0.05,
              "scaling_lr": 0.005, "rotation_lr": 0.001}


def _mkstate(n=80, cap=128, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                          rng.uniform(2.5, 5.0, (n, 1))],
                         axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=cap,
                                knn_window=16)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_step_matches_single_chip(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    W, H = 48, 64
    state = _mkstate()
    cam = make_camera(W, H)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    low_pass = jnp.asarray(0.3, jnp.float32)
    xyz_lr = jnp.asarray(1e-3, jnp.float32)
    opt = amod.init(state.params)

    # single-chip full step (params update + densify stats)
    s1, o1, a1 = step_mod.train_step(
        state, opt, cam, gt, bg, low_pass, xyz_lr,
        width=W, height=H, sh_degree=3, max_instances=4096,
        opt_cfg_leaves=OPT_LEAVES, update_densify_stats=True)

    mesh = sharding.make_mesh(n_dev)
    step = sharding.make_sharded_train_step(
        mesh, width=W, height=H, sh_degree=3,
        max_instances_per_shard=4096, update_densify_stats=True)
    s2, o2, a2 = step(state, opt, cam, gt, bg, low_pass, xyz_lr,
                      OPT_LEAVES)

    assert abs(float(a1.loss) - float(a2.loss)) < 1e-5
    assert abs(float(a1.l1) - float(a2.l1)) < 1e-5
    assert not bool(a2.instance_overflow)
    for name, a, b in zip(gmod.GaussianParams._fields, s2.params,
                          s1.params):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 1e-5, name
    # densification statistics parity (psum'd tap grads + radii)
    np.testing.assert_allclose(np.asarray(s2.xyz_gradient_accum),
                               np.asarray(s1.xyz_gradient_accum),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s2.denom),
                                  np.asarray(s1.denom))
    np.testing.assert_array_equal(np.asarray(s2.max_radii2d),
                                  np.asarray(s1.max_radii2d))
    for a, b in zip(jax.tree.leaves(o2), jax.tree.leaves(o1)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5


def test_sharded_step_reports_overflow():
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    W, H = 48, 64
    state = _mkstate()
    cam = make_camera(W, H)
    gt = jnp.zeros((3, H, W), jnp.float32)
    mesh = sharding.make_mesh(2)
    step = sharding.make_sharded_train_step(
        mesh, width=W, height=H, sh_degree=3,
        max_instances_per_shard=256)     # deliberately too-small tier
    _, _, aux = step(state, amod.init(state.params), cam, gt,
                     jnp.zeros(3, jnp.float32),
                     jnp.asarray(0.3, jnp.float32),
                     jnp.asarray(1e-3, jnp.float32), OPT_LEAVES)
    assert bool(aux.instance_overflow)
    assert int(aux.num_instances) > 256


def test_trainer_sharded_matches_single(tmp_path):
    """Trainer with devices=4 vs devices=1: same camera schedule, same
    densification decisions (clone/split/prune at iter 10), matching
    parameters after the round. (Longer windows diverge chaotically in
    BOTH modes: Adam sign-steps on freshly-zeroed moments amplify 1e-7
    fp differences to lr-scale ones, flipping later threshold decisions
    — the one-step parity test above pins down exact gradient/stat
    parity, this one proves the full Trainer loop runs sharded with
    densification end-to-end.)"""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from rain_tpu import config as cfg_mod
    from rain_tpu.train.trainer import Trainer
    from tests.test_training import _make_scene

    scene = _make_scene()
    parser = cfg_mod.build_parser("t")
    base = cfg_mod.extract_all(parser.parse_args([]))
    base["opt"] = dataclasses.replace(
        base["opt"], iterations=10, densify_from_iter=5,
        densification_interval=10, densify_until_iter=40,
        opacity_reset_interval=10_000)

    def run(devices, out):
        cfgs = dict(base)
        cfgs["system"] = dataclasses.replace(
            base["system"], capacity=512, max_instances=8192,
            devices=devices)
        tr = Trainer(scene, cfgs, str(tmp_path / out),
                     log_fn=lambda *a: None, tensorboard=False)
        tr.train(iterations=10, test_iterations=(), save_iterations=())
        return tr

    t1 = run(1, "single")
    t4 = run(4, "sharded")
    n1, n4 = int(t1.state.n_alive), int(t4.state.n_alive)
    assert n1 == n4 and n1 > 120   # densification actually ran
    for name, a, b in zip(gmod.GaussianParams._fields, t4.state.params,
                          t1.state.params):
        a, b = np.asarray(a)[:n1], np.asarray(b)[:n1]
        assert np.abs(a - b).max() < 2e-3, (name, np.abs(a - b).max())


def test_scaling_sweep_runs():
    """The scaling-sweep path (parallel/scaling.py + __graft_entry__
    sweep) executes a 1→2-device sweep on the virtual mesh and reports
    finite throughput/efficiency (the artifact generator for
    docs/SCALING_r*.json — this keeps the path from rotting)."""
    from rain_tpu.parallel.scaling import scaling_sweep
    msgs = []
    res = scaling_sweep([1, 2], width=64, height=64, n_gaussians=512,
                        iters=1, log_fn=msgs.append)
    assert [r["n_dev"] for r in res] == [1, 2]
    for r in res:
        assert np.isfinite(r["steps_per_s"]) and r["steps_per_s"] > 0
        assert np.isfinite(r["efficiency"]) and r["efficiency"] > 0
    assert res[0]["efficiency"] == 1.0
    assert len(msgs) == 2
