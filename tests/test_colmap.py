"""COLMAP binary parsing: native C parser vs Python fallback."""

import struct

import numpy as np
import pytest

from rain_tpu.data import colmap


@pytest.fixture
def synthetic_sparse(tmp_path):
    rng = np.random.default_rng(0)
    n = 200
    buf = struct.pack("<Q", n)
    want_xyz, want_rgb, want_err = [], [], []
    for i in range(n):
        xyz = rng.normal(size=3)
        rgb = rng.integers(0, 255, 3)
        err = rng.random()
        tl = int(rng.integers(0, 5))
        buf += struct.pack("<Q3d3BdQ", i, *xyz, *rgb, err, tl)
        buf += b"\x00" * (8 * tl)
        want_xyz.append(xyz)
        want_rgb.append(rgb)
        want_err.append(err)
    (tmp_path / "points3D.bin").write_bytes(buf)

    buf = struct.pack("<Q", 5)
    names = []
    for i in range(5):
        buf += struct.pack("<i7di", i + 1, *rng.normal(size=7), 1)
        name = f"img_{i:03d}.jpg"
        names.append(name)
        buf += name.encode() + b"\x00"
        npts = int(rng.integers(0, 4))
        buf += struct.pack("<Q", npts) + b"\x00" * (24 * npts)
    (tmp_path / "images.bin").write_bytes(buf)
    return tmp_path, np.array(want_xyz), np.array(want_rgb), \
        np.array(want_err), names


def test_points3d_python(synthetic_sparse):
    path, want_xyz, want_rgb, want_err, _ = synthetic_sparse
    xyz, rgb, err = colmap._read_points3d_binary_py(path / "points3D.bin")
    np.testing.assert_allclose(xyz, want_xyz)
    np.testing.assert_allclose(rgb, want_rgb)
    np.testing.assert_allclose(err[:, 0], want_err)


def test_points3d_native_matches_python(synthetic_sparse):
    path, want_xyz, *_ = synthetic_sparse
    if colmap._native() is None:
        pytest.skip("native library unavailable")
    xyz, rgb, err = colmap.read_points3d_binary(path / "points3D.bin")
    xyz_p, rgb_p, err_p = colmap._read_points3d_binary_py(
        path / "points3D.bin")
    np.testing.assert_array_equal(xyz, xyz_p)
    np.testing.assert_array_equal(rgb, rgb_p)
    np.testing.assert_array_equal(err, err_p)


def test_images_native_matches_python(synthetic_sparse):
    path, *_, names = synthetic_sparse
    im_p = colmap._read_images_binary_py(path / "images.bin")
    im_n = colmap.read_images_binary(path / "images.bin")
    assert im_n.keys() == im_p.keys()
    for k in im_p:
        np.testing.assert_allclose(im_n[k].qvec, im_p[k].qvec)
        np.testing.assert_allclose(im_n[k].tvec, im_p[k].tvec)
        assert im_n[k].name == im_p[k].name
        assert im_n[k].camera_id == im_p[k].camera_id
    assert sorted(i.name for i in im_p.values()) == sorted(names)
