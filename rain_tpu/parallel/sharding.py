"""Multi-chip training: tile-row sharding + per-Gaussian gradient psum.

The scale-out design the single-GPU reference lacks (SURVEY §2 parallelism
inventory): Gaussian parameters are replicated across the mesh; each chip
preprocesses against its own horizontal band of tile rows, bins and sorts
only its band's instances, composites its band with the Pallas kernel, and
computes the loss terms on its band; per-Gaussian parameter gradients are
then all-reduced (psum) over ICI — the deterministic collective
counterpart of the reference's atomicAdd within one GPU
(backward.cu:513-544). The Adam step runs replicated.

This is a first-class training mode, not a demo: ``make_sharded_train_step``
mirrors ``train.step.train_step`` exactly — screen-space tap gradients feed
the densification statistics (psum'd, since each band sees only part of a
Gaussian's pixels), radii come from the (replicated, deterministic)
preprocess, and per-shard binning overflow is surfaced so the host can grow
the per-shard instance tier (and retry the step — train.trainer).

SSIM has an 11x11 window (5-px support); each shard renders one extra tile
row (16 px >= 5) of halo on each side and averages the SSIM map only over
its band interior, with out-of-image pixels zeroed to reproduce the
single-chip zero-padded convolution exactly. The psum'd (L1, SSIM) sums
divided by the global pixel count equal the single-chip loss, so the
psum'd gradients equal single-chip gradients.

Gradient-reduction overlap: the per-leaf psums are emitted as separate
collectives so XLA's latency-hiding scheduler can start all-reducing
early-finishing leaves (SH features) while the remaining backward band
work runs; there is no host-side serialization point before the Adam step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as PS

from rain_tpu.model import adam as adam_mod
from rain_tpu.model import densify as densify_mod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import render as render_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.projection import TILE

AXIS = "tiles"
HALO = 1   # tile rows of halo per side (16 px >= SSIM 5-px support)


class ShardedAux(NamedTuple):
    """Mirror of train.step.StepAux for the sharded step (num_instances /
    overflow are the max/any over shards — the values that matter against
    the per-shard instance tier)."""
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_instances: jnp.ndarray
    instance_overflow: jnp.ndarray
    n_alive: jnp.ndarray


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def _render_band(params, alive, camera, band_ty0, xy_tap, *, width, height,
                 grid_x, grid_y, n_rows, sh_degree, max_instances,
                 low_pass, bg):
    """Render tile rows [band_ty0, band_ty0 + n_rows) (may extend past the
    image; out-of-range rows bin no instances and render empty).

    Returns (color [3, n_rows*16, grid_x*16], radii, num_instances,
    overflow) — radii are full-image (identical on every shard).
    """
    scales, quats, opac, shs = gmod.activate(params)
    prep = proj_ops.preprocess(
        params.xyz, scales, quats, opac, shs, alive,
        sh_degree=sh_degree,
        world_view=camera["world_view"], full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=width, height=height, low_pass=low_pass)
    radii = prep.radii

    # restrict each rect to this band's rows (dynamic clamp; the full-grid
    # rect from preprocess is already within [0, grid_y])
    lo = jnp.maximum(band_ty0, 0)
    hi = jnp.minimum(band_ty0 + n_rows, grid_y)
    y0 = jnp.clip(prep.rect_min[:, 1], lo, hi)
    y1 = jnp.clip(prep.rect_min[:, 1] + prep.rect_wh[:, 1], lo, hi)
    h = jnp.maximum(y1 - y0, 0)
    prep = prep._replace(
        rect_min=prep.rect_min.at[:, 1].set(y0),
        rect_wh=prep.rect_wh.at[:, 1].set(h),
        tiles_touched=jnp.where(h > 0, prep.rect_wh[:, 0] * h, 0))

    tiles, num_instances, overflow = render_ops.render_tiles(
        prep, xy_tap, grid_x=grid_x, grid_y=grid_y,
        ty0=band_ty0, n_rows=n_rows,
        max_instances=max_instances)

    img = render_ops.assemble_image(tiles, grid_x, n_rows,
                                    n_rows * TILE, grid_x * TILE)
    color = img[..., 0:3] + img[..., tile_render.CH_T:tile_render.CH_T + 1] \
        * bg[None, None, :]
    return color.transpose(2, 0, 1), radii, num_instances, overflow


def _band_loss_sums(color, gt_band, band_ty0, rows_per_band, *,
                    width, height):
    """(l1_sum, ssim_sum) over this band's interior pixels; out-of-image
    pixels zeroed so the SSIM convolution matches single-chip zero
    padding."""
    n_rows16 = color.shape[1]
    w_pad = color.shape[2]
    row_px = band_ty0 * TILE + jnp.arange(n_rows16)
    col_px = jnp.arange(w_pad)
    in_image = ((row_px >= 0) & (row_px < height))[:, None] & \
        (col_px < width)[None, :]
    band_lo = (band_ty0 + HALO) * TILE
    band_hi = band_lo + rows_per_band * TILE
    in_band = in_image & ((row_px >= band_lo) & (row_px < band_hi))[:, None]

    color = color * in_image[None]
    gt = gt_band * in_image[None]
    l1_sum = jnp.sum(jnp.abs(color - gt) * in_band[None])

    ssim_map = _ssim_map(color, gt)
    ssim_sum = jnp.sum(ssim_map * in_band[None])
    return l1_sum, ssim_sum


def _ssim_map(img1, img2, window_size: int = 11):
    c = img1.shape[0]
    g = jnp.asarray(loss_ops._gaussian_window(window_size))
    # the 11x11 window is the outer product g·gᵀ — apply it separably
    # (1x11 then 11x1), exactly like loss_ops.ssim
    kw = jnp.broadcast_to(g.reshape(1, 1, 1, window_size),
                          (c, 1, 1, window_size))
    kh = jnp.broadcast_to(g.reshape(1, 1, window_size, 1),
                          (c, 1, window_size, 1))
    pad = window_size // 2

    def conv(x):
        out = jax.lax.conv_general_dilated(
            x[None], kw, (1, 1), [(0, 0), (pad, pad)],
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        return jax.lax.conv_general_dilated(
            out, kh, (1, 1), [(pad, pad), (0, 0)],
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)[0]

    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 * mu1
    s2 = conv(img2 * img2) - mu2 * mu2
    s12 = conv(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return (((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
            ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)))


def make_sharded_train_step(mesh: Mesh, *, width: int, height: int,
                            sh_degree: int, max_instances_per_shard: int,
                            lambda_dssim: float = 0.2,
                            update_densify_stats: bool = True):
    """Build the multi-chip train step (tile-row sharded).

    Returns step(state, opt, camera, gt_image, bg, low_pass, xyz_lr,
    opt_leaves) → (state, opt, ShardedAux), the drop-in counterpart of
    train.step.train_step. gt_image: [3, H, W].
    """
    n_dev = mesh.devices.size
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    rows_per_band = (grid_y + n_dev - 1) // n_dev
    n_rows = rows_per_band + 2 * HALO
    # gt rows cover tile rows [-HALO, n_dev*rows_per_band + HALO)
    gt_rows = (n_dev * rows_per_band + 2 * HALO) * TILE

    def shard_fn(params, alive, camera, gt_pad, bg, low_pass, band_ids):
        band = band_ids[0]
        band_ty0 = band * rows_per_band - HALO
        gt_band = jax.lax.dynamic_slice(
            gt_pad, (0, band * rows_per_band * TILE, 0),
            (3, n_rows * TILE, gt_pad.shape[2]))

        n_pix = 3.0 * height * width

        def local_loss_fn(p, tap):
            """PURELY LOCAL objective — no collectives inside the
            differentiated closure. The global loss is
            psum(local) + lambda_dssim (the SSIM constant term), so
            psum'ing the local gradients gives exactly the global-loss
            gradient. Putting the psum inside the closure instead would
            scale every gradient by n_dev (lax.psum's transpose is a
            psum, and first-step Adam's scale invariance masks it)."""
            color, radii, num_inst, ovf = _render_band(
                p, alive, camera, band_ty0, tap,
                width=width, height=height,
                grid_x=grid_x, grid_y=grid_y, n_rows=n_rows,
                sh_degree=sh_degree,
                max_instances=max_instances_per_shard,
                low_pass=low_pass, bg=bg)
            l1_sum, ssim_sum = _band_loss_sums(
                color, gt_band, band_ty0, rows_per_band,
                width=width, height=height)
            local = ((1.0 - lambda_dssim) * l1_sum -
                     lambda_dssim * ssim_sum) / n_pix
            return local, (l1_sum, radii, num_inst, ovf)

        cap = params.xyz.shape[0]
        tap0 = jnp.zeros((cap, 2), jnp.float32)
        (local, (l1_sum, radii, num_inst, ovf)), (grads, tap_grad) = \
            jax.value_and_grad(local_loss_fn, argnums=(0, 1),
                               has_aux=True)(params, tap0)
        loss = jax.lax.psum(local, AXIS) + lambda_dssim
        l1 = jax.lax.psum(l1_sum, AXIS) / n_pix
        # each shard's autodiff sees only its band's compute; summing
        # completes the gradient of the global loss w.r.t. the replicated
        # parameters (ICI all-reduce — the cross-chip atomicAdd analogue).
        # The screen-space tap gradient is summed for the same reason
        # (densification stats need the full-image screen gradient).
        grads = jax.lax.psum(grads, AXIS)
        tap_grad = jax.lax.psum(tap_grad, AXIS)
        # per-shard load/overflow → values that matter vs the shard tier
        num_inst = jax.lax.pmax(num_inst, AXIS)
        ovf = jax.lax.psum(ovf.astype(jnp.int32), AXIS) > 0
        return loss, l1, grads, tap_grad, radii, num_inst, ovf

    @jax.jit
    def step(state: gmod.GaussianState, opt: adam_mod.AdamState,
             camera, gt_image, bg, low_pass, xyz_lr, opt_leaves):
        gt_pad = jnp.zeros((3, gt_rows, grid_x * TILE), jnp.float32)
        gt_pad = jax.lax.dynamic_update_slice(
            gt_pad, gt_image, (0, HALO * TILE, 0))
        band_ids = jnp.arange(n_dev, dtype=jnp.int32)
        alive = gmod.alive_mask(state)

        sharded = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(PS(), PS(), PS(), PS(), PS(), PS(), PS(AXIS)),
            out_specs=(PS(), PS(), PS(), PS(), PS(), PS(), PS()),
            check_vma=False,   # pallas_call outputs carry no vma info
        )
        loss, l1, grads, tap_grad, radii, num_inst, ovf = sharded(
            state.params, alive, camera, gt_pad, bg, low_pass, band_ids)

        if update_densify_stats:
            state = densify_mod.add_densification_stats(
                state, tap_grad, radii, width, height)

        lrs = gmod.GaussianParams(
            xyz=xyz_lr,
            features_dc=opt_leaves["feature_lr"],
            features_rest=opt_leaves["feature_lr"] / 20.0,
            scaling=opt_leaves["scaling_lr"],
            rotation=opt_leaves["rotation_lr"],
            opacity=opt_leaves["opacity_lr"],
        )
        new_params, new_opt = adam_mod.update(state.params, grads, opt, lrs)
        state = state._replace(params=new_params)
        aux = ShardedAux(loss=loss, l1=l1, num_instances=num_inst,
                         instance_overflow=ovf, n_alive=state.n_alive)
        return state, new_opt, aux

    return step
