"""Bitonic sorting network (ops.sort) vs numpy / lax.sort ground truth,
and binning equivalence across sort backends."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import sort as sort_ops


@pytest.mark.parametrize("n", [128, 1000, 4096, 65536])
def test_bitonic_sort_matches_numpy(n):
    rng = np.random.default_rng(n)
    k = rng.integers(0, 1 << 30, n, dtype=np.int32)
    got = np.asarray(sort_ops.bitonic_sort(jnp.asarray(k)))
    np.testing.assert_array_equal(got, np.sort(k))


@pytest.mark.parametrize("n,key_range", [(1000, 1 << 30), (4096, 60),
                                         (65536, 1 << 20)])
def test_bitonic_pairs_lexicographic(n, key_range):
    """Pairs sort orders by (key, value) lexicographically — the exact
    order of the packed (tile << bits | rank) single-key sort."""
    rng = np.random.default_rng(n)
    k = rng.integers(0, key_range, n, dtype=np.int32)
    v = rng.integers(0, 1 << 20, n, dtype=np.int32)
    gk, gv = map(np.asarray,
                 sort_ops.bitonic_sort_pairs(jnp.asarray(k),
                                             jnp.asarray(v)))
    perm = np.lexsort((v, k))
    np.testing.assert_array_equal(gk, k[perm])
    np.testing.assert_array_equal(gv, v[perm])


def test_binning_backends_agree(monkeypatch):
    """bin_gaussians output is identical under the bitonic and lax sort
    backends (packed keys are unique, so unstable == stable order)."""
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.ops import projection as proj_ops
    from tests.conftest import make_camera, make_scene

    s = make_scene(n=300, seed=5)
    W, H = 80, 64
    cam = make_camera(W, H)
    prep = proj_ops.preprocess(
        s["means"], s["scales"], s["quats"], s["opac"], s["shs"],
        s["alive"], sh_degree=3,
        world_view=cam["world_view"], full_proj=cam["full_proj"],
        camera_center=cam["camera_center"],
        tan_fovx=cam["tanfovx"], tan_fovy=cam["tanfovy"],
        width=W, height=H, low_pass=0.3)
    gx, gy = (W + 15) // 16, (H + 15) // 16

    outs = {}
    for impl in ("bitonic", "lax"):
        monkeypatch.setattr(binning_ops, "SORT_IMPL", impl)
        outs[impl] = binning_ops.bin_gaussians(prep, gx, gy, 2048)
    for name, a, b in zip(binning_ops.Binning._fields,
                          outs["bitonic"], outs["lax"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    assert int(outs["lax"].num_instances) > 300
