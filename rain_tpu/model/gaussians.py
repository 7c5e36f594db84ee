"""Gaussian scene state: a fixed-capacity pytree with an alive count.

Counterpart of the reference GaussianModel (scene/gaussian_model.py:13-137)
re-thought for XLA's static shapes: parameters live in capacity-C arrays
with a device scalar ``n_alive``; densify/prune (model.densify) write into
free slots and compact in place instead of reallocating tensors. Dead slots
always hold *valid* placeholder values (identity quaternion etc.) so no
NaN can leak out of masked lanes under autodiff.

Parameterization (identical to the reference):
  xyz            [C, 3]   raw positions
  features_dc    [C, 1, 3]  SH DC coefficients
  features_rest  [C, K-1, 3] higher SH coefficients (K = (deg+1)^2)
  scaling        [C, 3]   log-scales     (activation: exp)
  rotation       [C, 4]   quaternions    (activation: L2 normalize)
  opacity        [C, 1]   logits         (activation: sigmoid)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rain_tpu.ops import knn as knn_ops
from rain_tpu.ops import sh as sh_ops


class GaussianParams(NamedTuple):
    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray


class GaussianState(NamedTuple):
    params: GaussianParams
    n_alive: jnp.ndarray          # scalar int32
    max_radii2d: jnp.ndarray      # [C] f32   (gaussian_model.py:137)
    xyz_gradient_accum: jnp.ndarray  # [C] f32 (gaussian_model.py:141)
    denom: jnp.ndarray            # [C] f32

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def activate(params: GaussianParams):
    """Raw → rendering quantities (gaussian_model.py:15-31,85-105)."""
    scales = jnp.exp(params.scaling)
    quats = params.rotation / jnp.linalg.norm(
        params.rotation, axis=-1, keepdims=True)
    opacity = jax.nn.sigmoid(params.opacity[:, 0])
    shs = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    return scales, quats, opacity, shs


def alive_mask(state: GaussianState) -> jnp.ndarray:
    return jnp.arange(state.capacity) < state.n_alive


def _dead_fill(capacity: int, sh_rest: int) -> GaussianParams:
    """Placeholder values for dead slots (NaN-safe under all activations)."""
    rot = np.zeros((capacity, 4), np.float32)
    rot[:, 0] = 1.0
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, sh_rest, 3), jnp.float32),
        scaling=jnp.full((capacity, 3), -10.0, jnp.float32),
        rotation=jnp.asarray(rot),
        opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
    )


def create_from_pcd(points: np.ndarray, colors: np.ndarray, *,
                    sh_degree: int, capacity: int,
                    knn_window: int = 0) -> GaussianState:
    """Initialize from a point cloud (gaussian_model.py:114-137).

    Scales: log(sqrt(mean squared 3-NN distance)) per point, floored at
    1e-7 (the distCUDA2 clamp, gaussian_model.py:124); rotation: identity
    quaternion; opacity: logit(0.1).
    """
    n = points.shape[0]
    assert n <= capacity, (n, capacity)
    k = sh_ops.num_sh_coeffs(sh_degree)
    params = _dead_fill(capacity, k - 1)

    pts = jnp.asarray(points, jnp.float32)
    if knn_window > 0:
        d2 = knn_ops.mean_dist3(pts, window=knn_window)
    else:
        d2 = knn_ops.mean_dist3_auto(pts)
    dist2 = jnp.maximum(d2, 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    f_dc = sh_ops.rgb_to_sh_dc(jnp.asarray(colors, jnp.float32))[:, None, :]
    opac = inverse_sigmoid(0.1) * jnp.ones((n, 1), jnp.float32)

    params = GaussianParams(
        xyz=params.xyz.at[:n].set(pts),
        features_dc=params.features_dc.at[:n].set(f_dc),
        features_rest=params.features_rest,
        scaling=params.scaling.at[:n].set(scales),
        rotation=params.rotation,
        opacity=params.opacity.at[:n].set(opac),
    )
    return GaussianState(
        params=params,
        n_alive=jnp.asarray(n, jnp.int32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )


def from_arrays(xyz, f_dc, f_rest, scaling, rotation, opacity,
                capacity: int | None = None) -> GaussianState:
    """Build a state from raw attribute arrays (e.g. a loaded PLY)."""
    n = xyz.shape[0]
    capacity = capacity or n
    assert n <= capacity
    base = _dead_fill(capacity, f_rest.shape[1])
    params = GaussianParams(
        xyz=base.xyz.at[:n].set(jnp.asarray(xyz, jnp.float32)),
        features_dc=base.features_dc.at[:n].set(
            jnp.asarray(f_dc, jnp.float32)),
        features_rest=base.features_rest.at[:n].set(
            jnp.asarray(f_rest, jnp.float32)),
        scaling=base.scaling.at[:n].set(jnp.asarray(scaling, jnp.float32)),
        rotation=base.rotation.at[:n].set(jnp.asarray(rotation, jnp.float32)),
        opacity=base.opacity.at[:n].set(jnp.asarray(opacity, jnp.float32)),
    )
    return GaussianState(
        params=params,
        n_alive=jnp.asarray(n, jnp.int32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity growth (re-jit boundary)."""
    cap = state.capacity
    assert new_capacity >= cap
    extra = new_capacity - cap
    if extra == 0:
        return state
    fill = _dead_fill(new_capacity, state.params.features_rest.shape[1])

    def pad_params(old, filler):
        return jnp.concatenate([old, filler[cap:]], axis=0)

    params = GaussianParams(*[
        pad_params(o, f) for o, f in zip(state.params, fill)])

    def pad_stat(x):
        return jnp.concatenate([x, jnp.zeros((extra,), x.dtype)])

    return GaussianState(
        params=params,
        n_alive=state.n_alive,
        max_radii2d=pad_stat(state.max_radii2d),
        xyz_gradient_accum=pad_stat(state.xyz_gradient_accum),
        denom=pad_stat(state.denom),
    )
