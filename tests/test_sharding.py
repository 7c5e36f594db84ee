"""Multi-chip parity: sharded loss and gradients == single-chip values."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rain_tpu.model import adam as amod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops import render as render_ops
from rain_tpu.parallel import sharding
from tests.conftest import make_camera


def _mkstate(n=80, cap=128, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                          rng.uniform(2.5, 5.0, (n, 1))],
                         axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=cap,
                                knn_window=16)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_matches_single_chip(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    W, H = 48, 64
    state = _mkstate()
    cam = make_camera(W, H)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    alive = gmod.alive_mask(state)
    low_pass = jnp.asarray(0.3, jnp.float32)

    # single-chip loss + grads
    def loss_single(params):
        scales, quats, opac, shs = gmod.activate(params)
        out = render_ops.render(
            params.xyz, scales, quats, opac, shs, alive,
            camera=cam, width=W, height=H, sh_degree=3, bg=bg,
            low_pass=low_pass, max_instances=4096)
        loss, _ = loss_ops.training_loss(out.render, gt)
        return loss

    l1, g1 = jax.value_and_grad(loss_single)(state.params)

    # sharded
    mesh = sharding.make_mesh(n_dev)
    step = sharding.make_sharded_train_step(
        mesh, width=W, height=H, sh_degree=3,
        max_instances_per_shard=4096)
    opt = amod.init(state.params)
    opt_leaves = {"feature_lr": 0.0025, "opacity_lr": 0.05,
                  "scaling_lr": 0.005, "rotation_lr": 0.001}
    new_params, new_opt, l2 = step(
        state.params, alive, opt, cam, gt, bg, low_pass,
        jnp.asarray(1e-3, jnp.float32), opt_leaves)

    assert abs(float(l1) - float(l2)) < 1e-5, (float(l1), float(l2))

    # the sharded step applied one Adam update with psum'd grads; apply
    # the same update on the single-chip grads and compare parameters.
    lrs = gmod.GaussianParams(
        xyz=jnp.asarray(1e-3, jnp.float32), features_dc=0.0025,
        features_rest=0.000125, scaling=0.005, rotation=0.001,
        opacity=0.05)
    want_params, _ = amod.update(state.params, g1, opt, lrs)
    for name, a, b in zip(gmod.GaussianParams._fields, new_params,
                          want_params):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 1e-5, name
