"""IO tests: PLY round-trips, checkpoints, losses, config."""

import numpy as np
import jax.numpy as jnp

from rain_tpu import config as cfg_mod
from rain_tpu.data import ply as ply_io
from rain_tpu.model import adam as amod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import losses
from rain_tpu.train import checkpoint as ckpt


def test_ply_point_cloud_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 1, (100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3))
    path = tmp_path / "pc.ply"
    ply_io.write_point_cloud(path, xyz, rgb)
    pts, colors, normals = ply_io.read_point_cloud(path)
    np.testing.assert_allclose(pts, xyz, rtol=1e-6)
    np.testing.assert_allclose(colors * 255, rgb, atol=0.5)


def test_ply_gaussian_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 50
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    f_dc = rng.normal(size=(n, 1, 3)).astype(np.float32)
    f_rest = rng.normal(size=(n, 15, 3)).astype(np.float32)
    opacity = rng.normal(size=(n, 1)).astype(np.float32)
    scaling = rng.normal(size=(n, 3)).astype(np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    path = tmp_path / "g.ply"
    ply_io.write_gaussians(path, xyz, f_dc, f_rest, opacity, scaling,
                           rotation)
    d = ply_io.read_gaussians(path, max_sh_degree=3)
    np.testing.assert_allclose(d["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(d["f_dc"], f_dc, rtol=1e-6)
    np.testing.assert_allclose(d["f_rest"], f_rest, rtol=1e-6)
    np.testing.assert_allclose(d["opacity"], opacity, rtol=1e-6)
    np.testing.assert_allclose(d["scaling"], scaling, rtol=1e-6)
    np.testing.assert_allclose(d["rotation"], rotation, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 1, (20, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (20, 3)).astype(np.float32)
    state = gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=32,
                                 knn_window=8)
    opt = amod.init(state.params)
    opt = amod.AdamState(
        mu=opt.mu._replace(xyz=opt.mu.xyz.at[:20].set(0.5)),
        nu=opt.nu, step=jnp.asarray(7, jnp.int32))
    path = tmp_path / "ck.npz"
    ckpt.save_checkpoint(path, state, opt, 123, 4.5)
    st2, opt2, it, slr = ckpt.load_checkpoint(path, capacity=64)
    assert it == 123 and slr == 4.5
    assert st2.capacity == 64 and int(st2.n_alive) == 20
    np.testing.assert_allclose(np.asarray(st2.params.xyz[:20]),
                               np.asarray(state.params.xyz[:20]))
    np.testing.assert_allclose(np.asarray(opt2.mu.xyz[:20]), 0.5)
    assert int(opt2.step) == 7


def test_ply_snapshot_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 1, (20, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (20, 3)).astype(np.float32)
    state = gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=32,
                                 knn_window=8)
    path = tmp_path / "snap.ply"
    ckpt.save_ply_snapshot(path, state)
    st2 = ckpt.load_ply_snapshot(path, max_sh_degree=3, capacity=32)
    assert int(st2.n_alive) == 20
    np.testing.assert_allclose(np.asarray(st2.params.xyz[:20]),
                               np.asarray(state.params.xyz[:20]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.params.scaling[:20]),
                               np.asarray(state.params.scaling[:20]),
                               rtol=1e-6)


def test_ssim_identical_images():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)), jnp.float32)
    assert float(losses.ssim(img, img)) > 0.999


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)), jnp.float32)
    noisy = img + jnp.asarray(rng.normal(0, 0.2, (3, 32, 32)), jnp.float32)
    assert float(losses.ssim(img, noisy)) < float(losses.ssim(img, img))


def test_psnr_value():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)[0]), 20.0, rtol=1e-4)


def test_config_parser_and_presets():
    parser = cfg_mod.build_parser("t")
    args = parser.parse_args(["-s", "/data/garden", "--ours_new",
                              "--iterations", "7000"])
    cfgs = cfg_mod.extract_all(args)
    assert cfgs["model"].source_path == "/data/garden"
    assert cfgs["opt"].iterations == 7000
    cfgs = cfg_mod.apply_method_presets(cfgs, "/data/garden")
    assert cfgs["model"].images == "images_4"
    assert cfgs["rain"].c2f is True
    assert cfgs["rain"].num_gaussians == 10
    assert cfgs["rain"].warmup_iter == 10000


def test_config_roundtrip(tmp_path):
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfgs, path)
    loaded = cfg_mod.load_config(path)
    assert loaded["opt"] == cfgs["opt"]
    assert loaded["model"] == cfgs["model"]
