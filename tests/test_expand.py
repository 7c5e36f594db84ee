"""Fused MXU expansion + payload-carrying sort vs the legacy gather path.

The fused production path (ops.expand + ops.binning.sorted_pack) must be
bit-identical to the legacy bin_gaussians + pack-gather path — same
(tile, depth-rank) instance order (== the CUDA 64-bit radix order,
cuda_rasterizer/rasterizer_impl.cu:230-240), same selected attributes,
same gradients (deterministic scatter-add == gather transpose).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rain_tpu.data.cameras import Camera
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import render as render_mod


def _scene(n=700, width=160, height=112, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-2, 2, (n, 2)),
                          rng.uniform(1.5, 9.0, (n, 1))],
                         1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.2, -2.4, (n, 3))).astype(np.float32)
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    shs = rng.uniform(-0.4, 0.6, (n, 16, 3)).astype(np.float32)
    alive = np.ones((n,), bool)
    alive[::13] = False
    cam = Camera(uid=0, image_name="t", R=np.eye(3), T=np.zeros(3),
                 fovx=1.1, fovy=0.8, image=None, width=width, height=height)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    return pts, scales, quats, opac, shs, alive, camera


def _preprocess(scene, width, height):
    pts, scales, quats, opac, shs, alive, camera = scene
    return proj_ops.preprocess(
        jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(shs), jnp.asarray(alive),
        sh_degree=2, world_view=camera["world_view"],
        full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=width, height=height, low_pass=0.3, scale_modifier=1.0)


@pytest.mark.parametrize("max_instances", [2048, 4096])
def test_sorted_pack_matches_gather(max_instances):
    width, height = 160, 112
    scene = _scene()
    prep = _preprocess(scene, width, height)
    grid_x, grid_y = (width + 15) // 16, (height + 15) // 16
    n_tiles = grid_x * grid_y
    n = prep.depth.shape[0]

    binn = binning_ops.bin_gaussians(prep, grid_x, grid_y, max_instances)
    table = jnp.stack([
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
        prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
        prep.depth] + [jnp.zeros_like(prep.depth)] * 6, axis=0)
    table = jnp.concatenate([table, jnp.zeros_like(table[:, :1])], axis=1)
    ref = jnp.take(table, binn.gauss_idx, axis=1)

    table10 = table[:10, :n]
    pack, total, ovf = binning_ops.sorted_pack(
        table10, prep.tiles_touched, prep.rect_min, prep.rect_wh,
        jnp.asarray(0, jnp.int32), grid_x, n_tiles, max_instances)

    assert int(total) == int(binn.num_instances)
    assert not bool(ovf)
    m = int(binn.num_instances)
    np.testing.assert_array_equal(np.asarray(ref)[:, :m],
                                  np.asarray(pack)[:, :m])
    # padding columns carry no opacity (never composited anyway)
    assert np.all(np.asarray(pack)[5, m:] == 0.0)


def test_fused_render_and_grads_match_legacy(monkeypatch):
    # pin the scatter reduction: it sums instance gradients in the same
    # (tile-order) sequence as the legacy gather transpose, keeping this
    # comparison bit-exact (the MXU reduction sums in rank order — same
    # values, different f32 rounding; covered by its own parity test)
    monkeypatch.setattr(binning_ops, "REDUCE_IMPL", "scatter")
    width, height = 160, 112
    scene = _scene(seed=3)
    pts, scales, quats, opac, shs, alive, camera = scene
    M = 2048

    def run(impl):
        monkeypatch.setattr(render_mod, "EXPAND_IMPL", impl)

        def loss_fn(means, sc, qu, op, sh, tap):
            out = render_mod.render(
                means, sc, qu, op, sh, jnp.asarray(alive),
                camera=camera, width=width, height=height, sh_degree=2,
                bg=jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
                low_pass=0.3, max_instances=M, xy_tap=tap)
            w = jnp.cos(jnp.arange(out.render.size, dtype=jnp.float32)
                        ).reshape(out.render.shape)
            return jnp.sum(out.render * w), out

        tap = jnp.zeros((pts.shape[0], 2), jnp.float32)
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5),
                                  has_aux=True)(
            jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), tap)

    (v1, o1), g1 = run("legacy")
    (v2, o2), g2 = run("fused")

    assert int(o1.num_instances) == int(o2.num_instances)
    np.testing.assert_array_equal(np.asarray(o1.render),
                                  np.asarray(o2.render))
    np.testing.assert_array_equal(np.asarray(o1.n_contrib),
                                  np.asarray(o2.n_contrib))
    for a, b, name in zip(g1, g2, ["xyz", "scl", "rot", "op", "shs", "tap"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


@pytest.mark.parametrize("n,M,kill", [
    (300, 512, 0.3),
    # capacity >> instances: most chunks are padding, exercising the
    # pinned-window contiguity of wblk (an early gap here once leaked
    # uninitialized blocks into the visited span)
    (1200, 2048, 0.9),
])
def test_reduce_instances_segment_sums(n, M, kill):
    """reduce_instances == the per-Gaussian segment sum of rank-ordered
    instance gradient columns (the scatter-add/atomicAdd replacement)."""
    from rain_tpu.ops import expand as expand_ops
    rng = np.random.default_rng(11)
    C = 128
    tiles = rng.integers(0, 5, n).astype(np.int32)
    tiles[rng.random(n) < kill] = 0         # invisible Gaussians
    # depth order puts visible Gaussians first (rank structure)
    tiles = np.sort(tiles)[::-1].copy()
    offs = np.cumsum(tiles)
    exc = offs - tiles
    total = int(offs[-1])
    assert total < M
    npad = (n // C + 2) * C

    d = rng.standard_normal((16, M)).astype(np.float32)
    d[:, total:] = 0.0

    exc_p = np.zeros((1, npad), np.int32)
    exc_p[0, :n] = exc
    tiles_p = np.zeros((1, npad), np.int32)
    tiles_p[0, :n] = tiles
    # the production wblk formula (binning._sorted_pack_fwd): padding
    # chunks pinned to the last real chunk's window
    kidx = np.minimum(np.arange(M // C) * C, max(total - 1, 0))
    wstart = np.searchsorted(offs, kidx, side="right")
    wblk = np.clip(wstart // C, 0, npad // C - 2).astype(np.int32)
    assert np.all(np.diff(wblk) >= 0) and np.all(np.diff(wblk) <= 1)

    out = expand_ops.reduce_instances(
        jnp.asarray(d), jnp.asarray(exc_p), jnp.asarray(tiles_p),
        jnp.asarray(wblk), C=C)

    want = np.zeros((16, npad), np.float32)
    for g in range(n):
        want[:, g] = d[:, exc[g]:exc[g] + tiles[g]].sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6,
                               atol=1e-6)


def test_mxu_reduce_grads_match_scatter(monkeypatch):
    """Full-path gradient parity of the two reduction backends (same
    sums, different f32 summation order → tight allclose)."""
    width, height = 160, 112
    scene = _scene(seed=9)
    pts, scales, quats, opac, shs, alive, camera = scene
    M = 2048

    def run(impl):
        monkeypatch.setattr(binning_ops, "REDUCE_IMPL", impl)

        def loss_fn(means, sc, qu, op, sh, tap):
            out = render_mod.render(
                means, sc, qu, op, sh, jnp.asarray(alive),
                camera=camera, width=width, height=height, sh_degree=2,
                bg=jnp.asarray([0.3, 0.1, 0.2], jnp.float32),
                low_pass=0.3, max_instances=M, xy_tap=tap)
            w = jnp.sin(jnp.arange(out.render.size, dtype=jnp.float32)
                        ).reshape(out.render.shape)
            return jnp.sum(out.render * w), out

        tap = jnp.zeros((pts.shape[0], 2), jnp.float32)
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5),
                                  has_aux=True)(
            jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), tap)

    (v1, o1), g1 = run("scatter")
    (v2, o2), g2 = run("mxu")

    np.testing.assert_array_equal(np.asarray(o1.render),
                                  np.asarray(o2.render))
    for a, b, name in zip(g1, g2, ["xyz", "scl", "rot", "op", "shs", "tap"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6, err_msg=name)


def test_fused_overflow_flag(monkeypatch):
    """Overflow (total > M) must be reported identically; the step is
    discarded by the Trainer so only the flag/count semantics matter."""
    width, height = 160, 112
    scene = _scene(seed=5)
    prep = _preprocess(scene, width, height)
    grid_x, grid_y = (width + 15) // 16, (height + 15) // 16
    n_tiles = grid_x * grid_y
    M = 256  # far below the true instance count

    binn = binning_ops.bin_gaussians(prep, grid_x, grid_y, M)
    assert bool(binn.overflow)

    table10 = jnp.stack([
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
        prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
        prep.depth], axis=0)
    pack, total, ovf = binning_ops.sorted_pack(
        table10, prep.tiles_touched, prep.rect_min, prep.rect_wh,
        jnp.asarray(0, jnp.int32), grid_x, n_tiles, M)
    assert bool(ovf)
    assert int(total) == int(binn.num_instances)
    assert np.isfinite(np.asarray(pack)).all()


def test_permute_sort_path_matches_gather_path(monkeypatch):
    """The large-N payload-sort depth permutation (and its backward
    inverse) is bit-identical to the small-N column-gather path."""
    width, height = 160, 112
    scene = _scene(seed=5)
    prep = _preprocess(scene, width, height)
    grid_x = (width + 15) // 16
    n_tiles = grid_x * ((height + 15) // 16)
    M = 4096

    table10 = jnp.stack([
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
        prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
        prep.depth], axis=0)

    def f(t10):
        pack, total, ovf = binning_ops.sorted_pack(
            t10, prep.tiles_touched, prep.rect_min, prep.rect_wh,
            jnp.asarray(0, jnp.int32), grid_x, n_tiles, M)
        w = jnp.sin(jnp.arange(pack.size, dtype=jnp.float32)
                    ).reshape(pack.shape)
        return jnp.sum(pack[:10] * w[:10]), (pack, total)

    outs = {}
    for name, thresh in [("gather", 1 << 62), ("sort", 0)]:
        monkeypatch.setattr(binning_ops, "PERMUTE_SORT_MIN_N", thresh)
        (val, (pack, total)), grad = jax.value_and_grad(
            f, has_aux=True)(table10)
        outs[name] = (np.asarray(pack), int(total), np.asarray(grad))

    assert outs["gather"][1] == outs["sort"][1]
    m = outs["gather"][1]
    np.testing.assert_array_equal(outs["gather"][0][:, :m],
                                  outs["sort"][0][:, :m])
    np.testing.assert_array_equal(outs["gather"][2], outs["sort"][2])


def test_need_depth_false_matches_color_and_grads():
    """need_depth=False (the training configuration) must change ONLY
    the depth output channel (zeroed): color/alpha/n_contrib and all
    parameter gradients are identical."""
    width, height = 160, 112
    scene = _scene(seed=7)
    pts, scales, quats, opac, shs, alive, camera = scene
    M = 4096

    def run(need_depth):
        def loss_fn(op):
            out = render_mod.render(
                jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
                op, jnp.asarray(shs), jnp.asarray(alive),
                camera=camera, width=width, height=height, sh_degree=2,
                bg=jnp.asarray([0.3, 0.1, 0.2], jnp.float32),
                low_pass=0.3, max_instances=M, need_depth=need_depth)
            return jnp.sum(out.render ** 2), out
        return jax.value_and_grad(loss_fn, has_aux=True)(jnp.asarray(opac))

    (v1, o1), g1 = run(True)
    (v2, o2), g2 = run(False)
    np.testing.assert_array_equal(np.asarray(o1.render),
                                  np.asarray(o2.render))
    np.testing.assert_array_equal(np.asarray(o1.n_contrib),
                                  np.asarray(o2.n_contrib))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.any(np.asarray(o1.depth) > 0)
    assert np.all(np.asarray(o2.depth) == 0.0)
