"""Multi-chip training: tile-row sharding + per-Gaussian gradient psum.

The scale-out design the single-GPU reference lacks (SURVEY §2 parallelism
inventory): Gaussian parameters are replicated across the mesh; each chip
preprocesses against its own horizontal band of tile rows, bins and sorts
only its band's instances, composites its band with the Pallas kernel, and
computes the loss terms on its band; per-Gaussian parameter gradients are
then all-reduced (psum) over ICI — the deterministic collective
counterpart of the reference's atomicAdd within one GPU
(backward.cu:513-544). The Adam step runs replicated.

SSIM has an 11x11 window (5-px support); each shard renders one extra tile
row (16 px >= 5) of halo on each side and averages the SSIM map only over
its band interior, with out-of-image pixels zeroed to reproduce the
single-chip zero-padded convolution exactly. The psum'd (L1, SSIM) sums
divided by the global pixel count equal the single-chip loss, so the
psum'd gradients equal single-chip gradients.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as PS

from rain_tpu.model import adam as adam_mod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import losses as loss_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import render as render_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.projection import TILE

AXIS = "tiles"
HALO = 1   # tile rows of halo per side (16 px >= SSIM 5-px support)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def _render_band(params, alive, camera, band_ty0, *, width, height,
                 grid_x, grid_y, n_rows, sh_degree, max_instances,
                 low_pass, bg):
    """Render tile rows [band_ty0, band_ty0 + n_rows) (may extend past the
    image; out-of-range rows bin no instances and render empty).

    Returns color [3, n_rows*16, grid_x*16].
    """
    scales, quats, opac, shs = gmod.activate(params)
    prep = proj_ops.preprocess(
        params.xyz, scales, quats, opac, shs, alive,
        sh_degree=sh_degree,
        world_view=camera["world_view"], full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=width, height=height, low_pass=low_pass)

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

    n_tiles = n_rows * grid_x
    binn = binning_ops.bin_gaussians(
        prep, grid_x, grid_y, max_instances,
        tile_offset=band_ty0 * grid_x, n_tiles=n_tiles)

    z = jnp.zeros_like(prep.depth)
    table = jnp.stack([
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
        prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
        prep.depth, z, z, z, z, z, z], axis=-1)           # [N, 16]
    table = jnp.concatenate(
        [table, jnp.zeros_like(table[:1])], axis=0)       # dump row
    pack = table[binn.gauss_idx].T                        # [16, M]

    toff = (band_ty0 * grid_x).astype(jnp.int32)[None]
    tiles = tile_render.composite(
        pack, binn.tile_start, binn.tile_end, toff, grid_x)

    img = render_ops.assemble_image(tiles, grid_x, n_rows,
                                    n_rows * TILE, grid_x * TILE)
    color = img[..., 0:3] + img[..., tile_render.CH_T:tile_render.CH_T + 1] \
        * bg[None, None, :]
    return color.transpose(2, 0, 1)


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
                            lambda_dssim: float = 0.2):
    """Build the multi-chip train step.

    Returns step(params, alive, opt, camera, gt_image, bg, low_pass,
    xyz_lr, opt_leaves) → (params, opt, loss). gt_image: [3, H, W].
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

        def loss_fn(p):
            color = _render_band(
                p, alive, camera, band_ty0, width=width, height=height,
                grid_x=grid_x, grid_y=grid_y, n_rows=n_rows,
                sh_degree=sh_degree,
                max_instances=max_instances_per_shard,
                low_pass=low_pass, bg=bg)
            l1_sum, ssim_sum = _band_loss_sums(
                color, gt_band, band_ty0, rows_per_band,
                width=width, height=height)
            n_pix = 3.0 * height * width
            l1 = jax.lax.psum(l1_sum, AXIS) / n_pix
            ssim_v = jax.lax.psum(ssim_sum, AXIS) / n_pix
            return (1.0 - lambda_dssim) * l1 + \
                lambda_dssim * (1.0 - ssim_v)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # each shard's autodiff sees only its band's compute; summing
        # completes the gradient of the global loss w.r.t. the replicated
        # parameters (ICI all-reduce — the cross-chip atomicAdd analogue).
        grads = jax.lax.psum(grads, AXIS)
        return loss, grads

    @jax.jit
    def step(params, alive, opt, camera, gt_image, bg, low_pass, xyz_lr,
             opt_leaves):
        gt_pad = jnp.zeros((3, gt_rows, grid_x * TILE), jnp.float32)
        gt_pad = jax.lax.dynamic_update_slice(
            gt_pad, gt_image, (0, HALO * TILE, 0))
        band_ids = jnp.arange(n_dev, dtype=jnp.int32)

        sharded = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(PS(), PS(), PS(), PS(), PS(), PS(), PS(AXIS)),
            out_specs=(PS(), PS()),
            check_vma=False,   # pallas_call outputs carry no vma info
        )
        loss, grads = sharded(params, alive, camera, gt_pad, bg,
                              low_pass, band_ids)

        lrs = gmod.GaussianParams(
            xyz=xyz_lr,
            features_dc=opt_leaves["feature_lr"],
            features_rest=opt_leaves["feature_lr"] / 20.0,
            scaling=opt_leaves["scaling_lr"],
            rotation=opt_leaves["rotation_lr"],
            opacity=opt_leaves["opacity_lr"],
        )
        new_params, new_opt = adam_mod.update(params, grads, opt, lrs)
        return new_params, new_opt, loss

    return step
