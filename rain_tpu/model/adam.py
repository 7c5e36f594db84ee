"""Per-group Adam for the Gaussian parameter pytree.

Replicates the reference's torch.optim.Adam setup exactly
(scene/gaussian_model.py:144-153): one learning rate per parameter group,
eps = 1e-15 *outside* the sqrt, shared step count with bias correction,
and moments that survive densification surgery (model.densify permutes /
zeroes them the way cat_tensors_to_optimizer / _prune_optimizer do,
gaussian_model.py:248-317).

Hand-rolled rather than optax because densification must permute and
zero moment rows in place — the optimizer state is a plain pytree of
capacity-shaped arrays here, indexable like the parameters themselves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rain_tpu.model.gaussians import GaussianParams

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    step: jnp.ndarray    # scalar int32


def init(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=zeros, step=jnp.asarray(0, jnp.int32))


def learning_rates(opt_cfg, xyz_lr) -> GaussianParams:
    """Per-leaf learning rates (gaussian_model.py:144-151).

    xyz_lr is the scheduled position lr (already scaled by
    spatial_lr_scale); the rest are constants from OptimizationParams
    (arguments/__init__.py:63-72).
    """
    return GaussianParams(
        xyz=xyz_lr,
        features_dc=opt_cfg.feature_lr,
        features_rest=opt_cfg.feature_lr / 20.0,
        scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
        opacity=opt_cfg.opacity_lr,
    )


def update(params: GaussianParams, grads: GaussianParams,
           state: AdamState, lrs: GaussianParams):
    """One Adam step (torch semantics). Dead rows have zero grads and zero
    moments, so they remain exactly unchanged."""
    step = state.step + 1
    b1c = 1.0 - BETA1 ** step.astype(jnp.float32)
    b2c = 1.0 - BETA2 ** step.astype(jnp.float32)

    def leaf(p, g, m, v, lr):
        m = BETA1 * m + (1.0 - BETA1) * g
        v = BETA2 * v + (1.0 - BETA2) * (g * g)
        m_hat = m / b1c
        v_hat = v / b2c
        p = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
        return p, m, v

    out = jax.tree.map(leaf, params, grads, state.mu, state.nu, lrs)
    new_params = GaussianParams(*[o[0] for o in out])
    new_mu = GaussianParams(*[o[1] for o in out])
    new_nu = GaussianParams(*[o[2] for o in out])
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


def zero_moments_for(state: AdamState, leaf_name: str) -> AdamState:
    """Reset one group's moments (replace_tensor_to_optimizer,
    gaussian_model.py:248-261 — used by reset_opacity)."""
    idx = GaussianParams._fields.index(leaf_name)
    mu = state.mu._replace(**{leaf_name: jnp.zeros_like(state.mu[idx])})
    nu = state.nu._replace(**{leaf_name: jnp.zeros_like(state.nu[idx])})
    return AdamState(mu=mu, nu=nu, step=state.step)
