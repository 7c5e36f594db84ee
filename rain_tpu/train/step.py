"""The jitted training step: render → loss → grads → Adam + stats.

Counterpart of the hot loop body in reference train.py:71-147, as a pure
function of (params, opt state, camera arrays). Gradients w.r.t. the
screen-space tap are taken alongside the parameter gradients to feed the
densification statistics (the reference's screenspace_points.grad).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rain_tpu.model import adam as adam_mod
from rain_tpu.model import densify as densify_mod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops import render as render_ops


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_instances: jnp.ndarray
    instance_overflow: jnp.ndarray
    n_alive: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "max_instances",
                     "lambda_dssim", "update_densify_stats"))
def train_step(state: gmod.GaussianState, opt: adam_mod.AdamState,
               camera: dict, gt_image: jnp.ndarray, bg: jnp.ndarray,
               low_pass, xyz_lr, *,
               width: int, height: int, sh_degree: int, max_instances: int,
               opt_cfg_leaves: dict, lambda_dssim: float = 0.2,
               update_densify_stats: bool = True,
               real_wh=None):
    """One optimization step on one camera.

    opt_cfg_leaves: dict with feature_lr/opacity_lr/scaling_lr/rotation_lr
    (hashable python floats, closed over by jit as static via dict of
    weak-typed scalars — passed as a plain dict of floats).

    real_wh: optional (w, h) TRACED scalars — width/height are then the
    static tile-aligned size BUCKET, gt_image is zero-padded to it, and
    the loss masks to the true size: one compiled step serves every
    camera in the bucket (the reference pays zero recompiles because its
    rasterizer takes H/W at runtime, utils/camera_utils.py:8-41).
    """
    cap = state.capacity
    alive = gmod.alive_mask(state)

    def loss_fn(params, tap):
        scales, quats, opac, shs = gmod.activate(params)
        out = render_ops.render(
            params.xyz, scales, quats, opac, shs, alive,
            camera=camera, width=width, height=height,
            sh_degree=sh_degree, bg=bg, low_pass=low_pass,
            max_instances=max_instances, xy_tap=tap,
            need_depth=False,   # training loss never reads depth
            render_wh=real_wh)
        if real_wh is None:
            loss, l1 = loss_ops.training_loss(out.render, gt_image,
                                              lambda_dssim)
        else:
            loss, l1 = loss_ops.masked_training_loss(
                out.render, gt_image, real_wh[0], real_wh[1],
                lambda_dssim)
        return loss, (l1, out)

    tap0 = jnp.zeros((cap, 2), jnp.float32)
    (loss, (l1, out)), (grads, tap_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, tap0)

    if update_densify_stats:
        # NDC grad rescale must use the TRUE image size, not the bucket
        rw, rh = (width, height) if real_wh is None else real_wh
        state = densify_mod.add_densification_stats(
            state, tap_grad, out.radii, rw, rh)

    lrs = gmod.GaussianParams(
        xyz=xyz_lr,
        features_dc=opt_cfg_leaves["feature_lr"],
        features_rest=opt_cfg_leaves["feature_lr"] / 20.0,
        scaling=opt_cfg_leaves["scaling_lr"],
        rotation=opt_cfg_leaves["rotation_lr"],
        opacity=opt_cfg_leaves["opacity_lr"],
    )
    new_params, new_opt = adam_mod.update(state.params, grads, opt, lrs)
    state = state._replace(params=new_params)

    aux = StepAux(loss=loss, l1=l1, num_instances=out.num_instances,
                  instance_overflow=out.overflow, n_alive=state.n_alive)
    return state, new_opt, aux


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "max_instances"))
def eval_render(state: gmod.GaussianState, camera: dict, bg: jnp.ndarray,
                low_pass, scale_modifier=1.0, *, width: int, height: int,
                sh_degree: int, max_instances: int):
    """Non-training render; scale_modifier is the viewer's Gaussian-size
    slider (reference gaussian_renderer/__init__.py:29, applied to the
    activated scales before covariance construction)."""
    scales, quats, opac, shs = gmod.activate(state.params)
    return render_ops.render(
        state.params.xyz, scales, quats, opac, shs, gmod.alive_mask(state),
        camera=camera, width=width, height=height, sh_degree=sh_degree,
        bg=bg, low_pass=low_pass, max_instances=max_instances,
        scale_modifier=scale_modifier)
