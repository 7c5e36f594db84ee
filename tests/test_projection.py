"""Unit tests for the differentiable preprocess math vs closed forms."""

import numpy as np
import jax.numpy as jnp

from rain_tpu.ops import projection as proj
from rain_tpu.ops import sh as sh_ops
from tests.conftest import make_camera, make_scene


def test_cov3d_matches_dense_construction():
    rng = np.random.default_rng(0)
    n = 32
    scales = np.exp(rng.normal(0, 0.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    packed = np.asarray(proj.quat_scale_to_cov3d(jnp.asarray(scales),
                                                 jnp.asarray(quats)))
    for i in range(n):
        r, x, y, z = quats[i]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ])
        S = np.diag(scales[i])
        sigma = (R @ S) @ (R @ S).T
        want = np.array([sigma[0, 0], sigma[0, 1], sigma[0, 2],
                         sigma[1, 1], sigma[1, 2], sigma[2, 2]])
        np.testing.assert_allclose(packed[i], want, rtol=1e-5, atol=1e-6)


def test_cov3d_is_psd_and_scale_modifier():
    rng = np.random.default_rng(1)
    scales = np.exp(rng.normal(0, 0.5, (8, 3))).astype(np.float32)
    quats = rng.normal(size=(8, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    c1 = np.asarray(proj.quat_scale_to_cov3d(jnp.asarray(scales),
                                             jnp.asarray(quats), 1.0))
    c2 = np.asarray(proj.quat_scale_to_cov3d(jnp.asarray(scales),
                                             jnp.asarray(quats), 2.0))
    np.testing.assert_allclose(c2, 4.0 * c1, rtol=1e-5)


def test_preprocess_culling_and_radii():
    scene = make_scene(n=100, seed=3)
    cam = make_camera(48, 64)
    # Put some Gaussians behind the camera and some dead.
    means = np.asarray(scene["means"]).copy()
    means[:10, 2] = -5.0      # behind
    means[10:20, 2] = 0.1     # closer than NEAR_Z
    alive = np.ones(100, bool)
    alive[20:30] = False
    prep = proj.preprocess(
        jnp.asarray(means), scene["scales"], scene["quats"], scene["opac"],
        scene["shs"], jnp.asarray(alive),
        sh_degree=3, world_view=cam["world_view"],
        full_proj=cam["full_proj"], camera_center=cam["camera_center"],
        tan_fovx=float(cam["tanfovx"]), tan_fovy=float(cam["tanfovy"]),
        width=48, height=64)
    radii = np.asarray(prep.radii)
    assert (radii[:30] == 0).all()
    assert (radii[30:] > 0).any()
    tt = np.asarray(prep.tiles_touched)
    assert (tt[radii == 0] == 0).all()
    rw = np.asarray(prep.rect_wh)
    assert (tt[radii > 0] == (rw[:, 0] * rw[:, 1])[radii > 0]).all()
    # low-pass floors the 2D covariance: conic bounded above
    conic = np.asarray(prep.conic)[radii > 0]
    assert np.isfinite(conic).all()


def test_depth_is_view_space_z():
    scene = make_scene(n=50, seed=4)
    cam = make_camera(48, 64)
    prep = proj.preprocess(
        scene["means"], scene["scales"], scene["quats"], scene["opac"],
        scene["shs"], scene["alive"],
        sh_degree=0, world_view=cam["world_view"],
        full_proj=cam["full_proj"], camera_center=cam["camera_center"],
        tan_fovx=float(cam["tanfovx"]), tan_fovy=float(cam["tanfovy"]),
        width=48, height=64)
    # identity camera at origin: view z == world z
    np.testing.assert_allclose(np.asarray(prep.depth),
                               np.asarray(scene["means"])[:, 2], rtol=1e-6)


def test_sh_eval_degree0_is_constant():
    sh = np.zeros((4, 16, 3), np.float32)
    sh[:, 0, :] = 1.0
    dirs = np.array([[0, 0, 1.0]] * 4, np.float32)
    out = np.asarray(sh_ops.eval_sh(3, jnp.asarray(sh), jnp.asarray(dirs)))
    np.testing.assert_allclose(out, sh_ops.SH_C0, rtol=1e-6)


def test_sh_matches_reference_polynomials():
    """eval_sh vs an independent numpy transcription of utils/sh_utils.py."""
    rng = np.random.default_rng(5)
    sh = rng.normal(0, 1, (16, 25, 3)).astype(np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    C0, C1, C2, C3 = (sh_ops.SH_C0, sh_ops.SH_C1, sh_ops.SH_C2, sh_ops.SH_C3)
    want = C0 * sh[:, 0]
    want = (want - C1 * y * sh[:, 1] + C1 * z * sh[:, 2] - C1 * x * sh[:, 3])
    xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
    want = (want + C2[0] * xy * sh[:, 4] + C2[1] * yz * sh[:, 5] +
            C2[2] * (2 * zz - xx - yy) * sh[:, 6] + C2[3] * xz * sh[:, 7] +
            C2[4] * (xx - yy) * sh[:, 8])
    want = (want + C3[0] * y * (3 * xx - yy) * sh[:, 9] +
            C3[1] * xy * z * sh[:, 10] +
            C3[2] * y * (4 * zz - xx - yy) * sh[:, 11] +
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[:, 12] +
            C3[4] * x * (4 * zz - xx - yy) * sh[:, 13] +
            C3[5] * z * (xx - yy) * sh[:, 14] +
            C3[6] * x * (xx - 3 * yy) * sh[:, 15])
    got = np.asarray(sh_ops.eval_sh(3, jnp.asarray(sh), jnp.asarray(d)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
