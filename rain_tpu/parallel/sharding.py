"""Multi-chip training: Gaussian-sharded preprocess/optimizer + tile-row
sharded rasterization (ZeRO-style).

The scale-out design the single-GPU reference lacks (SURVEY §2 parallelism
inventory). Both shardings live on ONE mesh axis — each chip owns a
1/D slice of the Gaussian capacity AND one horizontal band of tile rows:

  fwd:  activate+preprocess its Gaussian shard (1/D of the per-Gaussian
        math) → all-gather the COMPACT per-Gaussian render streams
        (table10 40 B/Gaussian + rect ints 20 B/Gaussian) → bin/sort/
        composite its own tile band → band loss sums.
  bwd:  autodiff runs the band composite backward locally; the
        all-gather's transpose is a psum_scatter that reduces every
        band's table cotangents onto the owning shard (the cross-chip
        atomicAdd analogue, backward.cu:513-544) — then ONE preprocess
        backward per shard chains to parameter gradients. No full-pytree
        gradient all-reduce exists anywhere.
  opt:  Adam states and updates are Gaussian-sharded (ZeRO): the update
        runs outside the shard_map on globally-sharded arrays, purely
        elementwise, so XLA inserts no collectives at all.

Per-step collective budget (all riding ICI): 60 B/Gaussian gathered
forward + 40 B/Gaussian reduce-scattered backward ≈ 100 B/Gaussian —
at 262k Gaussians ~26 MB/step, at a 5M garden end-state ~0.5 GB/step.
The previous design replicated preprocess on every chip and psum'd the
full per-Gaussian gradient pytree (~244 B/Gaussian ≈ 1.2 GB/step at 5M)
with D-times-replicated preprocess compute and optimizer memory.

This is a first-class training mode, not a demo: ``make_sharded_train_step``
mirrors ``train.step.train_step`` exactly — screen-space tap gradients feed
the densification statistics (reduced onto shards by the same psum_scatter,
since each band sees only part of a Gaussian's pixels), radii come from the
shard's own preprocess, and per-shard binning overflow is surfaced so the
host can grow the per-shard instance tier (and retry the step —
train.trainer).

SSIM has an 11x11 window (5-px support); each shard renders one extra tile
row (16 px >= 5) of halo on each side and averages the SSIM map only over
its band interior, with out-of-image pixels zeroed to reproduce the
single-chip zero-padded convolution exactly. The psum'd (L1, SSIM) sums
divided by the global pixel count equal the single-chip loss; the
differentiated objective is purely local (no collectives inside the
closure except the all-gather whose transpose IS the reduction), so the
scattered gradients equal single-chip gradients.
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
from rain_tpu.ops import sh as sh_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.projection import TILE

AXIS = "shard"
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
    """Build the multi-chip train step (Gaussian-sharded + tile-row
    sharded, see module docstring).

    Returns step(state, opt, camera, gt_image, bg, low_pass, xyz_lr,
    opt_leaves) → (state, opt, ShardedAux), the drop-in counterpart of
    train.step.train_step. gt_image: [3, H, W]. The Gaussian capacity
    must be divisible by the device count.
    """
    n_dev = mesh.devices.size
    M = max_instances_per_shard
    if binning_ops._expand_chunk(M) == 0:
        raise ValueError(
            f"max_instances_per_shard={M} has no pow2 chunk divisor "
            f">= 128 (required by the fused expand path)")
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    rows_per_band = (grid_y + n_dev - 1) // n_dev
    n_rows = rows_per_band + 2 * HALO
    n_tiles = n_rows * grid_x
    # gt rows cover tile rows [-HALO, n_dev*rows_per_band + HALO)
    gt_rows = (n_dev * rows_per_band + 2 * HALO) * TILE

    def shard_fn(params, alive, camera, gt_pad, bg, low_pass, band_ids):
        band = band_ids[0]
        band_ty0 = band * rows_per_band - HALO
        toff = (band_ty0 * grid_x).astype(jnp.int32)
        gt_band = jax.lax.dynamic_slice(
            gt_pad, (0, band * rows_per_band * TILE, 0),
            (3, n_rows * TILE, gt_pad.shape[2]))

        n_pix = 3.0 * height * width

        def local_loss_fn(p, tap):
            """PURELY LOCAL objective. The only collective inside the
            closure is the all-gather of the compact per-Gaussian render
            streams, whose transpose (psum_scatter) performs exactly the
            cross-band gradient reduction onto this shard; the loss psum
            stays OUTSIDE (lax.psum's transpose would scale gradients by
            n_dev). The global loss is psum(local) + lambda_dssim."""
            scales, quats, opac, shs = gmod.activate(p)
            prep = proj_ops.preprocess(
                p.xyz, scales, quats, opac, shs, alive,
                sh_degree=sh_degree,
                world_view=camera["world_view"],
                full_proj=camera["full_proj"],
                camera_center=camera["camera_center"],
                tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
                width=width, height=height, low_pass=low_pass,
                colors_override=jnp.zeros((p.xyz.shape[0], 3),
                                          jnp.float32))
            xy = prep.xy + tap
            # compact per-Gaussian streams → full capacity on every chip.
            # The streams are gathered in TWO collectives so the heavy
            # geometry gather (28 B/Gaussian) has no data dependency on
            # the SH color evaluation: XLA's latency-hiding scheduler
            # overlaps the geometry all-gather's ICI transfer with the
            # local SH compute (deg-3: 16 basis x 3 channels per
            # Gaussian), instead of serializing collective-after-compute
            # as a single fused [10, cap] gather must (SURVEY §2 "overlap
            # via async collective"). The transpose stays two
            # psum_scatters — same per-row reductions, exactness
            # unchanged (tests/test_sharding.py).
            # (tiles_touched is NOT gathered: the band restriction below
            # recomputes each rect's in-band tile count from the rects)
            table7_sh = jnp.stack([
                prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
                xy[:, 0], xy[:, 1], prep.opacity,
                prep.depth], axis=0)                     # [7, cap/D]
            table7 = jax.lax.all_gather(table7_sh, AXIS, axis=1,
                                        tiled=True)
            rgb_sh = sh_ops.sh_to_rgb(sh_degree, shs, p.xyz,
                                      camera["camera_center"])
            rgb3 = jax.lax.all_gather(rgb_sh.T, AXIS, axis=1, tiled=True)
            table10 = jnp.concatenate(
                [table7[:6], rgb3, table7[6:7]], axis=0)
            rmin = jax.lax.all_gather(prep.rect_min, AXIS, axis=0,
                                      tiled=True)
            rwh = jax.lax.all_gather(prep.rect_wh, AXIS, axis=0,
                                     tiled=True)
            # restrict each rect to this band's rows (the full-grid rect
            # from preprocess is already within [0, grid_y])
            lo = jnp.maximum(band_ty0, 0)
            hi = jnp.minimum(band_ty0 + n_rows, grid_y)
            y0 = jnp.clip(rmin[:, 1], lo, hi)
            y1 = jnp.clip(rmin[:, 1] + rwh[:, 1], lo, hi)
            h = jnp.maximum(y1 - y0, 0)
            rmin_b = rmin.at[:, 1].set(y0)
            rwh_b = rwh.at[:, 1].set(h)
            tiles_b = jnp.where(h > 0, rwh[:, 0] * h, 0)

            pack, num_inst, ovf = binning_ops.sorted_pack(
                table10, tiles_b, rmin_b, rwh_b, toff, grid_x, n_tiles, M,
                False)   # training band: depth channel unused
            tile_start, tile_end = binning_ops.tile_ranges(
                rmin_b, rwh_b, tiles_b > 0, grid_x, n_tiles, toff, M)
            tiles_img = tile_render.composite(
                pack, tile_start, tile_end, toff[None], grid_x)
            img = render_ops.assemble_image(
                tiles_img, grid_x, n_rows, n_rows * TILE, grid_x * TILE)
            color = (img[..., 0:3] +
                     img[..., tile_render.CH_T:tile_render.CH_T + 1] *
                     bg[None, None, :]).transpose(2, 0, 1)
            l1_sum, ssim_sum = _band_loss_sums(
                color, gt_band, band_ty0, rows_per_band,
                width=width, height=height)
            local = ((1.0 - lambda_dssim) * l1_sum -
                     lambda_dssim * ssim_sum) / n_pix
            return local, (l1_sum, prep.radii, num_inst, ovf)

        cap_sh = params.xyz.shape[0]
        tap0 = jnp.zeros((cap_sh, 2), jnp.float32)
        (local, (l1_sum, radii_sh, num_inst, ovf)), \
            (grads_sh, tap_grad_sh) = jax.value_and_grad(
                local_loss_fn, argnums=(0, 1), has_aux=True)(params, tap0)
        # grads_sh / tap_grad_sh are ALREADY the full cross-band
        # reductions for this shard (all_gather transpose) — no psum.
        loss = jax.lax.psum(local, AXIS) + lambda_dssim
        l1 = jax.lax.psum(l1_sum, AXIS) / n_pix
        # per-shard load/overflow → values that matter vs the shard tier
        num_inst = jax.lax.pmax(num_inst, AXIS)
        ovf = jax.lax.psum(ovf.astype(jnp.int32), AXIS) > 0
        return loss, l1, grads_sh, tap_grad_sh, radii_sh, num_inst, ovf

    @jax.jit
    def step(state: gmod.GaussianState, opt: adam_mod.AdamState,
             camera, gt_image, bg, low_pass, xyz_lr, opt_leaves):
        cap = state.params.xyz.shape[0]
        if cap % n_dev:
            raise ValueError(f"capacity {cap} not divisible by "
                             f"{n_dev} devices")
        gt_pad = jnp.zeros((3, gt_rows, grid_x * TILE), jnp.float32)
        gt_pad = jax.lax.dynamic_update_slice(
            gt_pad, gt_image, (0, HALO * TILE, 0))
        band_ids = jnp.arange(n_dev, dtype=jnp.int32)
        alive = gmod.alive_mask(state)

        sharded = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(PS(AXIS), PS(AXIS), PS(), PS(), PS(), PS(),
                      PS(AXIS)),
            out_specs=(PS(), PS(), PS(AXIS), PS(AXIS), PS(AXIS), PS(),
                       PS()),
            check_vma=False,   # pallas_call outputs carry no vma info
        )
        loss, l1, grads, tap_grad, radii, num_inst, ovf = sharded(
            state.params, alive, camera, gt_pad, bg, low_pass, band_ids)

        # everything below is elementwise over the (sharded) capacity
        # axis — GSPMD keeps it sharded with zero collectives (ZeRO)
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
