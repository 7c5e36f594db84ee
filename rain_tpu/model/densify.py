"""Adaptive density control: clone / split / prune, with optimizer surgery.

Counterpart of the reference densification engine
(scene/gaussian_model.py:319-421) re-designed for static shapes: instead of
reallocating tensors, selected Gaussians are written into free capacity
slots with scatter-writes, and pruning is an in-place stable compaction
(a permutation applied to parameters, Adam moments, and stats). The result
preserves the reference's array ordering exactly: survivors keep their
relative order, and appended rows land after them in clone → abe → split
order (gaussian_model.py:403-415 sequence).

Semantics replicated:
- clone: grad-norm >= threshold AND max scale <= percent_dense * extent →
  copy verbatim (gaussian_model.py:388-401).
- split: grad >= threshold AND max scale > percent_dense * extent →
  N=2 children at rotated Gaussian-noise offsets with scales divided by
  (divide_ratio * N); the originals are pruned (gaussian_model.py:366-386).
- abe_split warmup pre-pass: same selection, ONE extra copy placed at
  0.3 * scene_extent * original position with unchanged scale
  (gaussian_model.py:342-363 — the noise samples there are computed but
  unused; the position really is scaled, not offset).
- prune: opacity < min_opacity, optionally screen radius > threshold or
  world size > 0.1 * extent (gaussian_model.py:410-415).
- new rows get zero Adam moments (cat_tensors_to_optimizer,
  gaussian_model.py:305-306); pruned rows' moments are discarded
  (_prune_optimizer, :268-269); densification stats reset to zero
  (densification_postfix, :335-337).

If appends would exceed capacity the excess rows are dropped and
``overflow`` is set so the host can grow capacity (a re-jit boundary);
the reference grows tensors dynamically instead.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rain_tpu.model import adam as adam_mod
from rain_tpu.model.gaussians import (GaussianParams, GaussianState,
                                      alive_mask, inverse_sigmoid)


class DensifyInfo(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_alive: jnp.ndarray
    overflow: jnp.ndarray


def add_densification_stats(state: GaussianState, tap_grad: jnp.ndarray,
                            radii: jnp.ndarray, width, height):
    """Accumulate screen-space gradient norms (gaussian_model.py:419-421,
    train.py:133-134). ``tap_grad`` is the pixel-unit xy gradient; the
    reference accumulates the NDC-scaled version (backward.cu:450-451), so
    scale by (W/2, H/2)."""
    vis = radii > 0
    scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
    g = jnp.linalg.norm(tap_grad * scale[None, :], axis=-1)
    return state._replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(vis, g, 0.0),
        denom=state.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(
            vis, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d),
    )


@jax.jit
def reset_opacity(state: GaussianState, opt: adam_mod.AdamState):
    """Clamp opacity to <= 0.01 and reset its moments
    (gaussian_model.py:200-203)."""
    op = jax.nn.sigmoid(state.params.opacity)
    new = inverse_sigmoid(jnp.minimum(op, 0.01))
    params = state.params._replace(opacity=new)
    return state._replace(params=params), adam_mod.zero_moments_for(
        opt, "opacity")


def _rotmat(q):
    """[M,4] normalized quats → [M,3,3] (utils/general_utils.py:52-73)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)


def _append(params: GaussianParams, n_alive, mask, new_leaves: GaussianParams,
            copies: int):
    """Scatter `copies` transformed copies of masked rows into free slots.

    new_leaves holds per-copy values shaped [copies, C, ...]. Returns
    (params, new_n, n_appended_requested).
    """
    cap = params.xyz.shape[0]
    rank = jnp.cumsum(mask) - 1                      # [C]
    n_sel = jnp.sum(mask)

    def write(leaf, new):
        out = leaf
        for j in range(copies):
            tgt = jnp.where(mask, n_alive + rank * copies + j, cap)
            out = out.at[tgt].set(jnp.where(
                mask.reshape((-1,) + (1,) * (leaf.ndim - 1)),
                new[j], leaf), mode="drop")
        return out

    params = GaussianParams(*[write(l, n) for l, n in
                              zip(params, new_leaves)])
    appended = n_sel * copies
    new_n = jnp.minimum(n_alive + appended, cap)
    return params, new_n, appended


def _compact(params: GaussianParams, opt: adam_mod.AdamState, keep):
    """Stable compaction: survivors first (order kept), then the rest;
    moments beyond the new alive count are zeroed."""
    cap = keep.shape[0]
    perm = jnp.argsort(~keep, stable=True)
    new_n = jnp.sum(keep).astype(jnp.int32)
    live = (jnp.arange(cap) < new_n)

    def perm_leaf(x):
        return x[perm]

    params = jax.tree.map(perm_leaf, params)

    def perm_zero(x):
        return jnp.where(live.reshape((-1,) + (1,) * (x.ndim - 1)),
                         x[perm], 0.0)

    mu = jax.tree.map(perm_zero, opt.mu)
    nu = jax.tree.map(perm_zero, opt.nu)
    return params, adam_mod.AdamState(mu=mu, nu=nu, step=opt.step), new_n, perm


@functools.partial(
    jax.jit,
    static_argnames=("n_split", "abe_split", "use_size_threshold"))
def densify_and_prune(state: GaussianState, opt: adam_mod.AdamState,
                      key: jax.Array, *,
                      max_grad, min_opacity, extent,
                      percent_dense, divide_ratio,
                      size_threshold=20.0,
                      use_size_threshold: bool = False,
                      n_split: int = 2,
                      abe_split: bool = False):
    """One densification round (gaussian_model.py:403-417)."""
    cap = state.capacity
    alive = alive_mask(state)
    grads = state.xyz_gradient_accum / state.denom
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    max_scale = jnp.exp(state.params.scaling).max(axis=1)
    small = max_scale <= percent_dense * extent
    high_grad = (grads >= max_grad) & alive
    n0 = state.n_alive

    params = state.params

    # --- clone (gaussian_model.py:388-401): verbatim copies -------------
    clone_mask = high_grad & small
    params, n1, req1 = _append(
        params, n0, clone_mask,
        jax.tree.map(lambda x: x[None], params), copies=1)

    # --- abe_split warmup pre-pass (gaussian_model.py:342-363) ----------
    split_mask = high_grad & ~small    # selection over ORIGINAL rows only:
    # appended clones have zero grad stats, exactly like the reference's
    # zero-padded grads (gaussian_model.py:344-345,366-367).
    n2, req2 = n1, 0
    if abe_split:
        abe_leaves = GaussianParams(
            xyz=(params.xyz * (0.3 * extent))[None],
            features_dc=params.features_dc[None],
            features_rest=params.features_rest[None],
            scaling=params.scaling[None],
            rotation=params.rotation[None],
            opacity=params.opacity[None],
        )
        params, n2, req2 = _append(params, n1, split_mask, abe_leaves,
                                   copies=1)

    # --- split (gaussian_model.py:366-386) ------------------------------
    stds = jnp.exp(params.scaling)                     # activated scales
    samples = jax.random.normal(key, (n_split, cap, 3)) * stds[None]
    rots = _rotmat(params.rotation)
    offsets = jnp.einsum("cij,scj->sci", rots, samples,
                         precision=jax.lax.Precision.HIGHEST)
    # scales / (divide_ratio * N), in log space (gaussian_model.py:377)
    new_scaling = params.scaling - jnp.log(divide_ratio * n_split)
    split_leaves = GaussianParams(
        xyz=params.xyz[None] + offsets,
        features_dc=jnp.broadcast_to(
            params.features_dc[None],
            (n_split,) + params.features_dc.shape),
        features_rest=jnp.broadcast_to(
            params.features_rest[None],
            (n_split,) + params.features_rest.shape),
        scaling=jnp.broadcast_to(new_scaling[None],
                                 (n_split,) + params.scaling.shape),
        rotation=jnp.broadcast_to(params.rotation[None],
                                  (n_split,) + params.rotation.shape),
        opacity=jnp.broadcast_to(params.opacity[None],
                                 (n_split,) + params.opacity.shape),
    )
    params, n3, req3 = _append(params, n2, split_mask, split_leaves,
                               copies=n_split)

    # --- prune (split originals + transparency/size, :385-386,410-415) --
    alive3 = jnp.arange(cap) < n3
    opacity = jax.nn.sigmoid(params.opacity[:, 0])
    prune = split_mask | (opacity < min_opacity)
    if use_size_threshold:
        big_vs = state.max_radii2d > size_threshold
        big_ws = jnp.exp(params.scaling).max(axis=1) > 0.1 * extent
        prune = prune | big_vs | big_ws
    keep = alive3 & ~prune

    params, opt, new_n, _ = _compact(params, opt, keep)

    new_state = GaussianState(
        params=params,
        n_alive=new_n,
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
    )
    requested = req1 + req2 + req3
    info = DensifyInfo(
        n_cloned=jnp.sum(clone_mask).astype(jnp.int32),
        n_split=jnp.sum(split_mask).astype(jnp.int32),
        n_pruned=(n3 - new_n).astype(jnp.int32),
        n_alive=new_n,
        overflow=(n0 + requested) > cap,
    )
    return new_state, opt, info
