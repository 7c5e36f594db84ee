"""Tile binning: build per-tile, depth-sorted Gaussian instance lists.

TPU-native re-design of the CUDA binning stage
(cuda_rasterizer/rasterizer_impl.cu:187-330). The CUDA code duplicates one
key per (Gaussian, touched tile) with key = tileID<<32 | float-bits(depth)
and radix-sorts 64-bit keys. We get the identical ordering with two cheaper,
static-shape XLA passes:

1. argsort Gaussians by depth once (stable; invisible → +inf keys sort
   last). Instances are then *generated already depth-ordered*.
2. expand Gaussians into per-(Gaussian, tile) instances with a cumsum +
   scatter-bump prefix-sum assignment (replaces the CUB InclusiveSum + the
   per-thread duplication loop, rasterizer_impl.cu:269,:281-290),
   enumerating each rect row-major exactly like duplicateWithKeys.
3. stable-sort instances by tile id only (32-bit): stability preserves the
   depth order within a tile, so the final order equals the CUDA 64-bit
   (tile, depth-bits) radix sort — including tie-breaking by Gaussian index
   (argsort stability).
4. per-tile [start, end) ranges via searchsorted (identifyTileRanges,
   rasterizer_impl.cu:105-127).

Everything is integer/stop-gradient; shapes are static with capacity
``max_instances`` (the counterpart of the CUDA lazily-resized binning
buffers, rasterize_points.cu:16-22). If the true instance count exceeds the
capacity, the farthest instances are dropped and ``overflow`` is set so the
host can grow the buffer tier and retrace.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rain_tpu.ops.projection import Preprocessed


class Binning(NamedTuple):
    gauss_idx: jnp.ndarray     # [M] int32 Gaussian index per instance
    #   (index into the capacity-N arrays; == N for padding instances)
    tile_id: jnp.ndarray       # [M] int32 sorted tile ids (== n_tiles pad)
    tile_start: jnp.ndarray    # [n_tiles] int32 range starts
    tile_end: jnp.ndarray      # [n_tiles] int32 range ends
    num_instances: jnp.ndarray  # scalar int32 (true count, may exceed M)
    overflow: jnp.ndarray      # scalar bool


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int,
                  max_instances: int,
                  tile_offset: int = 0, n_tiles: int | None = None) -> Binning:
    """Build the sorted instance list for a (sub)grid of tiles.

    Args:
      prep: preprocessed per-Gaussian arrays (tiles_touched already
        restricted to the target tile sub-grid when sharding).
      grid_x, grid_y: full tile-grid dimensions (static).
      max_instances: static instance capacity M.
      tile_offset: subtract this from computed tile ids (sharded path:
        a shard owning tile rows [r0, r1) passes tile_offset = r0*grid_x
        so its local ranges index its local tile array).
      n_tiles: number of tiles owned (defaults to grid_x*grid_y).
    """
    n = prep.depth.shape[0]
    if n_tiles is None:
        n_tiles = grid_x * grid_y

    visible = prep.tiles_touched > 0
    depth_key = jnp.where(visible, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)          # [N] depth order

    tiles_o = prep.tiles_touched[order]
    offs = jnp.cumsum(tiles_o)                           # inclusive
    total = offs[-1]

    # all depth-ordered per-Gaussian integers the expansion needs, packed
    # so each instance performs ONE row gather (separate [M]<-[N] gathers
    # cost ~25ms each at 2M instances on TPU)
    pack = jnp.stack([
        offs - tiles_o,                                  # exclusive offset
        prep.rect_min[order, 0], prep.rect_min[order, 1],
        jnp.maximum(prep.rect_wh[order, 0], 1),
        order.astype(jnp.int32),
    ], axis=1)                                           # [N, 5]

    i = jnp.arange(max_instances, dtype=jnp.int32)
    # instance→Gaussian assignment: g_i = #{g : offs[g] <= i}. A binary
    # search (searchsorted) costs ~300ms at 2M instances on TPU; the
    # scatter+cumsum formulation below is ~10x faster: bump a counter at
    # each Gaussian's end offset, then prefix-sum. Duplicate offsets
    # (invisible Gaussians with zero tiles) accumulate correctly.
    bumps = jnp.zeros((max_instances,), jnp.int32).at[offs].add(
        1, mode="drop")
    g_c = jnp.minimum(jnp.cumsum(bumps), n - 1)
    row = pack[g_c]                                      # [M, 5]
    local = i - row[:, 0]
    w = row[:, 3]
    dy = local // w                                       # row-major rect
    dx = local - dy * w                                   # enumeration
    tx = row[:, 1] + dx
    ty = row[:, 2] + dy
    tile = (ty * grid_x + tx - tile_offset).astype(jnp.int32)
    valid = i < jnp.minimum(total, max_instances)
    tile = jnp.where(valid, tile, n_tiles)

    # stable sort by tile id only; the original Gaussian index rides as a
    # payload so no post-sort gather is needed
    tile_sorted, gauss_sorted = jax.lax.sort(
        (tile, row[:, 4]), dimension=0, is_stable=True, num_keys=1)
    gauss_sorted = jnp.where(tile_sorted < n_tiles, gauss_sorted, n)

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tids, side="left")
    tile_end = jnp.searchsorted(tile_sorted, tids, side="right")

    return Binning(
        gauss_idx=gauss_sorted.astype(jnp.int32),
        tile_id=tile_sorted,
        tile_start=tile_start.astype(jnp.int32),
        tile_end=tile_end.astype(jnp.int32),
        num_instances=total,
        overflow=total > max_instances,
    )
