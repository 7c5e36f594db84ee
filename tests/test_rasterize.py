"""Rasterizer correctness: production pipeline vs oracle vs finite diff.

The oracle (ops.reference_composite) is a sequential transcription of the
CUDA compositing semantics; the production path (ops.render) is the Pallas
pipeline (run in interpret mode on CPU). Forward images, auxiliary outputs,
and every parameter gradient must agree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rain_tpu.ops import projection as proj
from rain_tpu.ops import render as render_ops
from rain_tpu.ops.reference_composite import composite_reference
from tests.conftest import make_camera, make_scene

W, H = 48, 64
BG = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)


def _preprocess(scene, cam, tap=None, low_pass=0.3):
    prep = proj.preprocess(
        scene["means"], scene["scales"], scene["quats"], scene["opac"],
        scene["shs"], scene["alive"],
        sh_degree=3, world_view=cam["world_view"],
        full_proj=cam["full_proj"], camera_center=cam["camera_center"],
        tan_fovx=float(cam["tanfovx"]), tan_fovy=float(cam["tanfovy"]),
        width=W, height=H, low_pass=low_pass)
    if tap is not None:
        prep = prep._replace(xy=prep.xy + tap)
    return prep


def _render_prod(scene, cam, tap=None, low_pass=0.3, max_instances=2048):
    return render_ops.render(
        scene["means"], scene["scales"], scene["quats"], scene["opac"],
        scene["shs"], scene["alive"],
        camera=cam, width=W, height=H, sh_degree=3, bg=BG,
        low_pass=low_pass, max_instances=max_instances, xy_tap=tap)


@pytest.mark.parametrize("seed,opac_bias", [(0, 0.0), (7, 3.0)])
def test_forward_matches_oracle(seed, opac_bias):
    # opac_bias=3 → near-opaque Gaussians → exercises early termination
    scene = make_scene(n=300, seed=seed, opac_bias=opac_bias)
    cam = make_camera(W, H)
    out = _render_prod(scene, cam)
    ref = composite_reference(_preprocess(scene, cam), W, H, BG)
    np.testing.assert_allclose(np.asarray(out.render),
                               np.asarray(ref["render"]),
                               rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.final_t),
                               np.asarray(ref["final_T"]),
                               rtol=1e-4, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(out.n_contrib),
                                  np.asarray(ref["n_contrib"]))
    np.testing.assert_allclose(np.asarray(out.depth[0]),
                               np.asarray(ref["depth"][0]),
                               rtol=1e-4, atol=1e-3)


def test_empty_scene_renders_background():
    scene = make_scene(n=16, seed=1)
    scene["alive"] = jnp.zeros(16, bool)
    out = _render_prod(scene, cam := make_camera(W, H))
    want = np.broadcast_to(np.asarray(BG)[:, None, None], (3, H, W))
    np.testing.assert_allclose(np.asarray(out.render), want, atol=1e-6)
    assert int(out.num_instances) == 0


def test_gradients_match_oracle():
    scene = make_scene(n=150, seed=1, opac_bias=0.5)
    cam = make_camera(W, H)
    tgt = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (3, H, W)),
                      jnp.float32)
    n = 150
    tap0 = jnp.zeros((n, 2))

    def loss_prod(means, scales, quats, opac, shs, tap):
        s = dict(scene, means=means, scales=scales, quats=quats,
                 opac=opac, shs=shs)
        return jnp.abs(_render_prod(s, cam, tap).render - tgt).mean()

    def loss_ref(means, scales, quats, opac, shs, tap):
        s = dict(scene, means=means, scales=scales, quats=quats,
                 opac=opac, shs=shs)
        ref = composite_reference(_preprocess(s, cam, tap), W, H, BG)
        return jnp.abs(ref["render"] - tgt).mean()

    args = (scene["means"], scene["scales"], scene["quats"],
            scene["opac"], scene["shs"], tap0)
    gp = jax.grad(loss_prod, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["means", "scales", "quats", "opac", "shs", "tap"],
                          gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / scale < 1e-4, name


def test_oracle_gradients_match_finite_differences():
    """Ground the oracle itself with central differences (float64)."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(3)
        n = 12
        scene = make_scene(n=n, seed=3, scale_range=(-2.5, -1.5))
        scene = {k: jnp.asarray(np.asarray(v, np.float64))
                 if np.asarray(v).dtype != bool else v
                 for k, v in scene.items()}
        cam = {k: jnp.asarray(np.asarray(v, np.float64))
               for k, v in make_camera(W, H).items()}
        tgt = jnp.asarray(rng.uniform(0, 1, (3, H, W)))
        bg = jnp.asarray([0.1, 0.2, 0.3])

        def loss(means, opac):
            s = dict(scene, means=means, opac=opac)
            prep = proj.preprocess(
                s["means"], s["scales"], s["quats"], s["opac"], s["shs"],
                s["alive"], sh_degree=3, world_view=cam["world_view"],
                full_proj=cam["full_proj"],
                camera_center=cam["camera_center"],
                tan_fovx=float(cam["tanfovx"]),
                tan_fovy=float(cam["tanfovy"]),
                width=W, height=H, low_pass=0.3)
            out = composite_reference(prep, W, H, bg)
            return jnp.abs(out["render"] - tgt).mean()

        g_means, g_opac = jax.grad(loss, argnums=(0, 1))(
            scene["means"], scene["opac"])
        eps = 1e-6
        for idx in [(0, 0), (3, 2), (7, 1)]:
            m = np.asarray(scene["means"]).copy()
            m[idx] += eps
            lp = float(loss(jnp.asarray(m), scene["opac"]))
            m[idx] -= 2 * eps
            lm = float(loss(jnp.asarray(m), scene["opac"]))
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - float(g_means[idx])) < 1e-4 * max(
                1.0, abs(fd)), (idx, fd, float(g_means[idx]))
        for i in [1, 5, 9]:
            o = np.asarray(scene["opac"]).copy()
            o[i] += eps
            lp = float(loss(scene["means"], jnp.asarray(o)))
            o[i] -= 2 * eps
            lm = float(loss(scene["means"], jnp.asarray(o)))
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - float(g_opac[i])) < 1e-4 * max(1.0, abs(fd))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_instance_overflow_flag():
    scene = make_scene(n=300, seed=0)
    out = _render_prod(scene, make_camera(W, H), max_instances=256)
    assert bool(out.overflow)
    assert int(out.num_instances) > 256
    # image still finite (nearest instances kept)
    assert np.isfinite(np.asarray(out.render)).all()


def test_low_pass_blurs():
    scene = make_scene(n=100, seed=2, opac_bias=1.0)
    cam = make_camera(W, H)
    sharp = np.asarray(_render_prod(scene, cam, low_pass=0.3).render)
    blurred = np.asarray(_render_prod(scene, cam, low_pass=30.0).render)
    # stronger low-pass → smoother image → smaller total variation
    tv = lambda im: np.abs(np.diff(im, axis=1)).sum() + np.abs(
        np.diff(im, axis=2)).sum()
    assert tv(blurred) < tv(sharp)
