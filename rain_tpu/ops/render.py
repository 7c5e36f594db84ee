"""The full differentiable render pipeline (preprocess → bin → composite).

Counterpart of the reference render API + rasterizer orchestration
(gaussian_renderer/__init__.py:9-79, rasterizer_impl.cu:187-330), returning
the same bundle: render, viewspace gradient tap, visibility, radii, depth.

Differentiability map:
- preprocess: pure JAX → autodiff (replaces backward.cu:133-386).
- binning: integer-only, no gradients (sorting is not differentiable in
  the reference either — the backward replays the forward's sorted lists).
- instance gather: jnp gather; its VJP is a deterministic scatter-add that
  reduces per-instance gradients to per-Gaussian gradients (replaces the
  CUDA atomicAdd reduction, backward.cu:513-544).
- composite: Pallas custom-VJP kernel (ops.tile_render).

``xy_tap`` plays the role of the reference's ``screenspace_points`` dummy
(gaussian_renderer/__init__.py:10-14): pass zeros [N, 2] and differentiate
w.r.t. it to obtain the per-Gaussian screen-space gradient used by the
densification statistics. It is in *pixel* units; multiply by
(W/2, H/2) to match the reference's NDC-scaled accumulation
(backward.cu:450-451,535-536).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp

import functools

import jax
import numpy as np

from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.projection import TILE


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pack_take(table, idx, n1):
    """table [16, n1] → pack [16, M] columns by idx, with the gather and
    its transpose (a deterministic per-Gaussian scatter-add — the
    atomicAdd replacement, backward.cu:513-544) each fenced by
    optimization_barriers: fused into neighboring arithmetic XLA lowers
    them as ~13 ms serial loops at M=1e6 on v5e; isolated they take the
    async dynamic-slice path."""
    return jnp.take(table, idx, axis=1)


def _pack_take_fwd(table, idx, n1):
    t, i = jax.lax.optimization_barrier((table, idx))
    return jax.lax.optimization_barrier(jnp.take(t, i, axis=1)), idx


def _pack_take_bwd(n1, idx, g):
    g, i = jax.lax.optimization_barrier((g, idx))
    d_table = jnp.zeros((g.shape[0], n1), g.dtype).at[:, i].add(
        g, mode="drop")
    zi = np.zeros(idx.shape, jax.dtypes.float0)
    return (jax.lax.optimization_barrier(d_table), zi)


_pack_take.defvjp(_pack_take_fwd, _pack_take_bwd)


class RenderOutput(NamedTuple):
    render: jnp.ndarray        # [3, H, W] color (background applied)
    depth: jnp.ndarray         # [1, H, W] alpha-weighted depth (no grad)
    alpha: jnp.ndarray         # [H, W] accumulated alpha (no grad)
    final_t: jnp.ndarray       # [H, W] final transmittance
    radii: jnp.ndarray         # [N] int32 (visibility_filter = radii > 0)
    n_contrib: jnp.ndarray     # [H, W] int32
    num_instances: jnp.ndarray  # scalar int32
    overflow: jnp.ndarray      # scalar bool


# "fused" (default): MXU one-hot expansion + payload-carrying sort, no
# [M] gathers (ops.expand / ops.binning.sorted_pack). "legacy": rank-
# indexed gathers + [16, M] pack gather (kept for A/B + parity tests).
# Single-chip knob only: the sharded band step (parallel.sharding)
# always uses the fused sorted_pack pipeline and ignores this env var.
EXPAND_IMPL = os.environ.get("RAIN_TPU_EXPAND", "fused")
if EXPAND_IMPL not in ("fused", "legacy"):
    raise ValueError(
        f"RAIN_TPU_EXPAND={EXPAND_IMPL!r} is not a valid expand "
        f"implementation; use 'fused' or 'legacy'")


def render_tiles(prep: proj_ops.Preprocessed,
                 xy_tap: jnp.ndarray | None,
                 *,
                 grid_x: int, grid_y: int,
                 ty0, n_rows: int,
                 max_instances: int,
                 need_depth: bool = True):
    """Composite a horizontal band of tile rows [ty0, ty0 + n_rows).

    Returns tiles [n_rows*grid_x, 256, 8] plus (num_instances, overflow).
    ``ty0`` may be a traced band offset (the sharded path,
    parallel.sharding); ``n_rows`` is static. ``need_depth=False``
    (training) zeroes the depth output channel instead of carrying the
    row through the instance sort (fused path only).
    """
    n = prep.depth.shape[0]
    n_tiles = n_rows * grid_x
    xy = prep.xy if xy_tap is None else prep.xy + xy_tap
    toff = jnp.asarray([ty0 * grid_x], jnp.int32) if isinstance(ty0, int) \
        else (ty0 * grid_x).astype(jnp.int32)[None]

    fused = EXPAND_IMPL == "fused" and \
        binning_ops._expand_chunk(max_instances) > 0
    if fused:
        table10 = jnp.stack([
            prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
            xy[:, 0], xy[:, 1], prep.opacity,
            prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
            prep.depth], axis=0)                          # [10, N]
        pack, num_instances, overflow = binning_ops.sorted_pack(
            table10, prep.tiles_touched, prep.rect_min, prep.rect_wh,
            toff[0], grid_x, n_tiles, max_instances, need_depth)
        visible = prep.tiles_touched > 0
        tile_start, tile_end = binning_ops.tile_ranges(
            prep.rect_min, prep.rect_wh, visible, grid_x, n_tiles,
            toff[0], max_instances)
        tiles = tile_render.composite(pack, tile_start, tile_end, toff,
                                      grid_x)
        return tiles, num_instances, overflow

    binn = binning_ops.bin_gaussians(
        prep, grid_x, grid_y, max_instances,
        tile_offset=ty0 * grid_x, n_tiles=n_tiles)

    # One gather of raw per-Gaussian rendering attributes into the
    # kernel's [16, M] layout, with a dump column at index N for padding
    # instances. The table is built directly in [16, N+1] (each row one
    # contiguous copy) and gathered along the LANE axis: the
    # alternative [N, 16] row-stack + row-gather + transpose relayouts
    # the whole table twice and measures ~14 ms slower at M=1e6 on
    # v5e. The gather's VJP is a deterministic scatter-add — the
    # atomicAdd replacement (backward.cu:513-544). The kernel derives
    # tile-local quadratics itself, so no per-instance math happens
    # here.
    z = jnp.zeros_like(prep.depth)
    table = jnp.stack([
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        xy[:, 0], xy[:, 1], prep.opacity,
        prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
        prep.depth, z, z, z, z, z, z], axis=0)            # [16, N]
    table = jnp.concatenate(
        [table, jnp.zeros_like(table[:, :1])], axis=1)    # dump column
    pack = _pack_take(table, binn.gauss_idx, n + 1)       # [16, M]

    tiles = tile_render.composite(
        pack, binn.tile_start, binn.tile_end, toff, grid_x)
    return tiles, binn.num_instances, binn.overflow


def assemble_image(tiles: jnp.ndarray, grid_x: int, n_rows: int,
                   height: int, width: int) -> jnp.ndarray:
    """[n_rows*grid_x, 256, 8] tiles → [height, width, 8] image band."""
    img = tiles.reshape(n_rows, grid_x, TILE, TILE, 8)
    img = img.transpose(0, 2, 1, 3, 4).reshape(n_rows * TILE,
                                               grid_x * TILE, 8)
    return img[:height, :width]


def render(means3d, scales_act, quats_act, opacity_act, shs, alive,
           *,
           camera: dict,
           width: int, height: int,
           sh_degree: int,
           bg: jnp.ndarray,
           low_pass=0.3,
           scale_modifier: float = 1.0,
           max_instances: int,
           xy_tap: jnp.ndarray | None = None,
           colors_override: jnp.ndarray | None = None,
           cov3d_override: jnp.ndarray | None = None,
           need_depth: bool = True,
           render_wh=None) -> RenderOutput:
    """Render one view. All post-activation inputs (see model.gaussians).

    camera: dict from data.cameras.Camera.render_inputs().
    need_depth=False (training steps) returns a zero depth channel.
    render_wh: optional (w, h) TRACED scalars of the true image size —
      width/height then define the static render-bucket extent (tile
      aligned padding) and all size-dependent VALUES (focal lengths,
      NDC→pixel scaling, loss normalization in the caller) use the traced
      size, so one compiled graph serves every camera in the bucket.
      Output arrays are bucket-sized; rows/cols beyond the true size are
      dead pixels the caller masks.
    """
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE

    rw, rh = (width, height) if render_wh is None else render_wh
    prep = proj_ops.preprocess(
        means3d, scales_act, quats_act, opacity_act, shs, alive,
        sh_degree=sh_degree,
        world_view=camera["world_view"],
        full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=rw, height=rh,
        tile_bounds=(0, 0, grid_x, grid_y),
        low_pass=low_pass, scale_modifier=scale_modifier,
        colors_override=colors_override, cov3d_override=cov3d_override)

    tiles, num_instances, overflow = render_tiles(
        prep, xy_tap, grid_x=grid_x, grid_y=grid_y, ty0=0, n_rows=grid_y,
        max_instances=max_instances, need_depth=need_depth)

    img = assemble_image(tiles, grid_x, grid_y, height, width)
    color = img[..., 0:3] + img[..., tile_render.CH_T:tile_render.CH_T + 1] \
        * bg[None, None, :]
    return RenderOutput(
        render=color.transpose(2, 0, 1),
        depth=img[..., tile_render.CH_DEPTH][None],
        alpha=img[..., tile_render.CH_ALPHA],
        final_t=img[..., tile_render.CH_T],
        radii=prep.radii,
        n_contrib=img[..., tile_render.CH_NCONTRIB].astype(jnp.int32),
        num_instances=num_instances,
        overflow=overflow,
    )


def mark_visible(means3d: jnp.ndarray, world_view: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility test (GaussianRasterizer.markVisible,
    rasterize_points.cu:193-212): view-space z > 0.2."""
    ones = jnp.ones_like(means3d[:, :1])
    p_view = jnp.concatenate([means3d, ones], axis=-1) @ world_view[:3, :].T
    return p_view[:, 2] > proj_ops.NEAR_Z
