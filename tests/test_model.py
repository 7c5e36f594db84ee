"""Model-layer tests: Adam semantics, densification, KNN, state mgmt."""

import numpy as np
import jax
import jax.numpy as jnp

from rain_tpu.model import adam as amod
from rain_tpu.model import densify as dmod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import knn as knn_ops


def _mkstate(n=16, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return gmod.create_from_pcd(pts, cols, sh_degree=3, capacity=cap,
                                knn_window=8)


def test_adam_matches_torch_formula():
    state = _mkstate()
    opt = amod.init(state.params)
    rng = np.random.default_rng(1)
    grads = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(0, 1, x.shape), x.dtype),
        state.params)
    lrs = gmod.GaussianParams(xyz=0.01, features_dc=0.0025,
                              features_rest=0.000125, scaling=0.005,
                              rotation=0.001, opacity=0.05)
    new_params, new_opt = amod.update(state.params, grads, opt, lrs)
    # manual torch-Adam for the xyz leaf at t=1
    g = np.asarray(grads.xyz)
    m = 0.1 * g
    v = 0.001 * g * g
    mhat = m / (1 - 0.9)
    vhat = v / (1 - 0.999)
    want = np.asarray(state.params.xyz) - 0.01 * mhat / (
        np.sqrt(vhat) + 1e-15)
    np.testing.assert_allclose(np.asarray(new_params.xyz), want, rtol=1e-5)
    assert int(new_opt.step) == 1


def test_adam_dead_rows_unchanged():
    state = _mkstate(n=16, cap=64)
    opt = amod.init(state.params)
    grads = jax.tree.map(jnp.zeros_like, state.params)
    # nonzero grads only on alive rows
    grads = grads._replace(xyz=grads.xyz.at[:16].set(1.0))
    lrs = gmod.GaussianParams(0.01, 0.0025, 0.000125, 0.005, 0.001, 0.05)
    new_params, _ = amod.update(state.params, grads, opt, lrs)
    np.testing.assert_array_equal(np.asarray(new_params.xyz[16:]),
                                  np.asarray(state.params.xyz[16:]))
    assert not np.allclose(np.asarray(new_params.xyz[:16]),
                           np.asarray(state.params.xyz[:16]))


def test_densify_clone_small_high_grad():
    state = _mkstate(n=16, cap=64)
    opt = amod.init(state.params)
    # mark rows 0..3 as high-gradient; small scales → clone path
    accum = state.xyz_gradient_accum.at[:4].set(1.0)
    state = state._replace(xyz_gradient_accum=accum,
                           denom=state.denom.at[:16].set(1.0))
    s2, o2, info = dmod.densify_and_prune(
        state, opt, jax.random.key(0), max_grad=0.5, min_opacity=0.005,
        extent=100.0, percent_dense=0.01, divide_ratio=0.8)
    # scales are tiny vs percent_dense*extent=1.0 → clone, not split
    assert int(info.n_cloned) == 4
    assert int(info.n_split) == 0
    assert int(info.n_alive) == 20
    # clones replicate the source rows (appended after the originals)
    np.testing.assert_allclose(np.asarray(s2.params.xyz[16:20]),
                               np.asarray(state.params.xyz[:4]), rtol=1e-6)


def test_densify_split_big_high_grad():
    state = _mkstate(n=16, cap=64)
    opt = amod.init(state.params)
    # make rows 0..1 big: scale exp(2) >> percent_dense*extent
    scaling = state.params.scaling.at[:2].set(2.0)
    state = state._replace(
        params=state.params._replace(scaling=scaling),
        xyz_gradient_accum=state.xyz_gradient_accum.at[:2].set(1.0),
        denom=state.denom.at[:16].set(1.0))
    s2, o2, info = dmod.densify_and_prune(
        state, opt, jax.random.key(0), max_grad=0.5, min_opacity=0.005,
        extent=100.0, percent_dense=0.01, divide_ratio=0.8)
    assert int(info.n_split) == 2
    # 16 + 4 children - 2 pruned originals = 18
    assert int(info.n_alive) == 18
    # children scales divided by divide_ratio*N=1.6 (log-space)
    child_scales = np.asarray(s2.params.scaling[14:18])
    np.testing.assert_allclose(child_scales, 2.0 - np.log(1.6), rtol=5e-5)
    # survivors keep relative order: rows 2..15 shift to 0..13
    np.testing.assert_allclose(np.asarray(s2.params.xyz[:14]),
                               np.asarray(state.params.xyz[2:16]),
                               rtol=1e-6)


def test_densify_prunes_transparent():
    state = _mkstate(n=16, cap=64)
    opt = amod.init(state.params)
    op = state.params.opacity.at[5:8].set(gmod.inverse_sigmoid(0.001))
    state = state._replace(params=state.params._replace(opacity=op),
                           denom=state.denom.at[:16].set(1.0))
    s2, _, info = dmod.densify_and_prune(
        state, opt, jax.random.key(0), max_grad=0.5, min_opacity=0.005,
        extent=100.0, percent_dense=0.01, divide_ratio=0.8)
    assert int(info.n_alive) == 13
    assert int(info.n_pruned) == 3


def test_reset_opacity():
    state = _mkstate(n=16, cap=32)
    opt = amod.init(state.params)
    opt = amod.AdamState(
        mu=opt.mu._replace(opacity=opt.mu.opacity + 1.0),
        nu=opt.nu, step=opt.step)
    s2, o2 = dmod.reset_opacity(state, opt)
    assert float(jax.nn.sigmoid(s2.params.opacity[:16]).max()) <= 0.0101
    assert float(jnp.abs(o2.mu.opacity).max()) == 0.0


def test_knn_matmul_matches_exact():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
    mm = np.asarray(knn_ops.mean_dist3_matmul(jnp.asarray(pts)))
    exact = np.asarray(knn_ops.mean_dist3_exact(jnp.asarray(pts), block=512))
    np.testing.assert_allclose(mm, exact, rtol=1e-6)


def test_knn_window_is_upper_bound():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
    approx = np.asarray(knn_ops.mean_dist3(jnp.asarray(pts), window=64))
    exact = np.asarray(knn_ops.mean_dist3_exact(jnp.asarray(pts), block=512))
    rel = np.abs(approx - exact) / (exact + 1e-12)
    assert (approx >= exact - 1e-6).all()       # candidates ⊂ all points
    assert np.median(rel) < 1e-6                # exact for most points


def test_capacity_growth_preserves_state():
    state = _mkstate(n=16, cap=32)
    g2 = gmod.grow_capacity(state, 64)
    assert g2.capacity == 64
    assert int(g2.n_alive) == 16
    np.testing.assert_array_equal(np.asarray(g2.params.xyz[:32]),
                                  np.asarray(state.params.xyz))
    # grown dead rows are NaN-safe
    _, quats, _, _ = gmod.activate(g2.params)
    assert np.isfinite(np.asarray(quats)).all()


def test_stats_accumulation():
    state = _mkstate(n=8, cap=16)
    tap = jnp.ones((16, 2)) * 0.001
    radii = jnp.asarray([5, 0, 3, 0, 1, 2, 0, 4] + [0] * 8, jnp.int32)
    s2 = dmod.add_densification_stats(state, tap, radii, 100, 200)
    vis = np.asarray(radii) > 0
    accum = np.asarray(s2.xyz_gradient_accum)
    want = np.linalg.norm([0.001 * 50, 0.001 * 100])
    np.testing.assert_allclose(accum[vis], want, rtol=1e-5)
    assert (accum[~vis] == 0).all()
    np.testing.assert_array_equal(np.asarray(s2.denom),
                                  vis.astype(np.float32))


def test_instance_tier_ladder():
    """Half-step tier ladder {2^k, 3*2^(k-1)} (trainer._next_instance_tier)
    and the direct jump to the tier fitting a reported overflow count."""
    from rain_tpu.train.trainer import _next_instance_tier
    m = 262144
    seq = [m]
    for _ in range(6):
        m = _next_instance_tier(m)
        seq.append(m)
    assert seq == [262144, 393216, 524288, 786432, 1048576, 1572864,
                   2097152]
    # every ladder value stays compatible with the expansion chunk
    from rain_tpu.ops import binning
    for v in seq:
        assert binning._expand_chunk(v) > 0

    # the overflow jump: from 1.25M straight past 3.72M
    m = 1245184
    while m < 3720126:
        m = _next_instance_tier(m)
    assert m == 4194304
