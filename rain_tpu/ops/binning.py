"""Tile binning: build per-tile, depth-sorted Gaussian instance lists.

TPU-native re-design of the CUDA binning stage
(cuda_rasterizer/rasterizer_impl.cu:187-330). The CUDA code duplicates one
key per (Gaussian, touched tile) with key = tileID<<32 | float-bits(depth)
and radix-sorts 64-bit keys. We get the identical ordering with cheaper,
static-shape XLA passes built around the Gaussian's *depth rank*:

1. argsort Gaussians by depth once (stable; invisible → +inf keys sort
   last). Instances are then *generated already depth-ordered*, identified
   by (tile, depth-rank) pairs.
2. expand Gaussians into per-(Gaussian, tile) instances: the
   instance→rank step function comes from a scatter-bump + prefix sum
   (replaces the CUB InclusiveSum + per-thread duplication loop,
   rasterizer_impl.cu:269,:281-290); rects are enumerated row-major
   exactly like duplicateWithKeys via three rank-indexed 1-D gathers
   (TPU row-gathers of wide rows are ~5 GB/s, so per-instance data is
   kept to three int32 streams here).
3. sort by (tile, rank). When (n_tiles+1) << rank_bits fits in int31 the
   pair is packed into ONE int32 key and sorted unstably (the packed keys
   are unique, and rank order == stable depth order), halving sort
   traffic; otherwise a stable two-operand sort by tile only. Both equal
   the CUDA 64-bit (tile, depth-bits) radix order — including
   tie-breaking by Gaussian index (argsort stability).
4. per-tile [start, end) ranges via searchsorted (identifyTileRanges,
   rasterizer_impl.cu:105-127).

Everything is integer/stop-gradient; shapes are static with capacity
``max_instances`` (the counterpart of the CUDA lazily-resized binning
buffers, rasterize_points.cu:16-22). If the true instance count exceeds the
capacity, the farthest instances are dropped and ``overflow`` is set so the
host can grow the buffer tier and retrace.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rain_tpu.ops import expand as expand_ops
from rain_tpu.ops import sort as sort_ops
from rain_tpu.ops.projection import Preprocessed

# Sort backend for the per-instance (tile, rank) sort. The explicit
# bitonic network (ops.sort) wins in isolated microbenchmarks but LOSES
# integrated into the train step on a real v5e (7.34 -> 3.69 iters/s on
# the garden proxy: 210 un-fused XLA stages at M=2^20 cost ~0.5 ms each
# in the large graph), so lax.sort is the default; "bitonic" is kept
# for A/B measurement.
SORT_IMPL = os.environ.get("RAIN_TPU_SORT", "lax")


class Binning(NamedTuple):
    order: jnp.ndarray         # [N] int32 depth order (rank → Gaussian)
    rank: jnp.ndarray          # [M] int32 depth rank per sorted instance
    #   (== N for padding instances — index of the zero dump row in a
    #   depth-ordered, one-row-padded per-Gaussian table)
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
    M = max_instances

    visible = prep.tiles_touched > 0
    depth_key = jnp.where(visible, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)

    tiles_o = prep.tiles_touched[order]
    offs = jnp.cumsum(tiles_o)                           # inclusive
    total = offs[-1]
    exc = (offs - tiles_o).astype(jnp.int32)

    # instance→rank step function: r_i = #{g : offs[g] <= i}; scatter a
    # bump at each Gaussian's end offset and prefix-sum (duplicate
    # offsets from zero-tile Gaussians accumulate correctly). Then fetch
    # per-Gaussian rect data per instance with three narrow [M] 1-D
    # gathers. The optimization_barriers are load-bearing: left to
    # itself, XLA fuses each gather into its consumer arithmetic and
    # the fused serial gathers cost ~9 ms each at M=1e6 on v5e;
    # isolated, they lower onto the async dynamic-slice path (~1 ms,
    # overlapped with neighbors).
    w_d = jnp.maximum(prep.rect_wh[order, 0], 1).astype(jnp.int32)
    base_d = (prep.rect_min[order, 1] * grid_x +
              prep.rect_min[order, 0]).astype(jnp.int32)
    i = jnp.arange(M, dtype=jnp.int32)
    bumps = jnp.zeros((M,), jnp.int32).at[offs].add(1, mode="drop")
    rank = jnp.minimum(jnp.cumsum(bumps), n - 1)
    rank = jax.lax.optimization_barrier(rank)
    exc_r = jax.lax.optimization_barrier(exc[rank])
    w_i = jax.lax.optimization_barrier(w_d[rank])
    base_r = jax.lax.optimization_barrier(base_d[rank])
    local = i - exc_r
    dy = local // w_i
    dx = local - dy * w_i
    tile = base_r + dy * grid_x + dx - tile_offset
    valid = i < jnp.minimum(total, M)
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)

    rank_bits = max(int(n - 1).bit_length(), 1)
    rank_padded = jnp.where(valid, rank, 0)
    if (n_tiles + 1) << rank_bits <= 2 ** 31:
        # packed single-key unstable sort: keys are unique (one instance
        # per (tile, Gaussian)), so order equals the stable two-key sort
        key = (tile << rank_bits) | rank_padded
        if SORT_IMPL == "bitonic":
            key_sorted = sort_ops.bitonic_sort(key)
        else:
            key_sorted = jax.lax.sort((key,), dimension=0,
                                      is_stable=False, num_keys=1)[0]
        tile_sorted = key_sorted >> rank_bits
        rank_sorted = key_sorted & ((1 << rank_bits) - 1)
    else:
        # wide keys: lexicographic (tile, rank) pair sort — exact same
        # order as the packed key
        if SORT_IMPL == "bitonic":
            tile_sorted, rank_sorted = sort_ops.bitonic_sort_pairs(
                tile, rank_padded)
        else:
            tile_sorted, rank_sorted = jax.lax.sort(
                (tile, rank_padded), dimension=0,
                is_stable=True, num_keys=1)

    in_range = tile_sorted < n_tiles
    rank_sorted = jnp.where(in_range, rank_sorted, n)
    # order padded with a dump index so order_pad[rank_sorted] is safe
    order_pad = jnp.concatenate(
        [order, jnp.full((1,), n, jnp.int32)])
    gauss_sorted = jax.lax.optimization_barrier(
        order_pad[jax.lax.optimization_barrier(rank_sorted)])

    tile_start, tile_end = tile_ranges(
        prep.rect_min, prep.rect_wh, visible, grid_x, n_tiles,
        tile_offset, M)

    return Binning(
        order=order,
        rank=rank_sorted.astype(jnp.int32),
        gauss_idx=gauss_sorted.astype(jnp.int32),
        tile_id=tile_sorted.astype(jnp.int32),
        tile_start=tile_start.astype(jnp.int32),
        tile_end=tile_end.astype(jnp.int32),
        num_instances=total,
        overflow=total > M,
    )


# Gaussians per indicator-matmul block in tile_ranges. [R, B] + [B, X]
# bf16 indicator transients stay ~150 MB at the garden grid (R=53, X=82)
# instead of growing linearly with N (≈1.3 GB at N=4M unblocked).
TR_BLOCK = 1 << 19


def _rect_counts(ys, xs, rect_min, rect_wh, visible):
    """counts2d[y, x] = #visible Gaussians whose rect covers tile (x, y),
    via one 0/1-indicator matmul on the MXU — exact in f32 (products are
    0/1, counts < 2^24)."""
    ry0 = rect_min[:, 1]
    ry1 = ry0 + rect_wh[:, 1]
    row_ind = ((ys[:, None] >= ry0[None, :]) &
               (ys[:, None] < ry1[None, :]) &
               visible[None, :]).astype(jnp.bfloat16)        # [R, B]
    rx0 = rect_min[:, 0]
    rx1 = rx0 + rect_wh[:, 0]
    col_ind = ((xs[None, :] >= rx0[:, None]) &
               (xs[None, :] < rx1[:, None])).astype(jnp.bfloat16)  # [B, X]
    return jax.lax.dot_general(
        row_ind, col_ind, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def tile_ranges(rect_min, rect_wh, visible, grid_x: int, n_tiles: int,
                tile_offset, max_instances: int):
    """Per-tile [start, end) instance ranges (identifyTileRanges,
    rasterizer_impl.cu:105-127).

    Instead of binary-searching the sorted [M] array (a 20-round while
    loop, ~19 ms wall in the integrated graph), count covering Gaussians
    per tile directly on the MXU with rect-interval indicator matmuls
    (_rect_counts), blocked over N so the bf16 indicator transients stay
    bounded at end-state populations — then prefix-sum the flattened
    tile-major counts. Equal to the searchsorted ranges whenever the
    instance buffer did not overflow; on overflow (a discarded step — the
    Trainer re-runs at a grown tier) ranges are clamped to [0, M] so the
    kernels stay in-bounds.
    """
    M = max_instances
    n = rect_min.shape[0]
    n_rows = n_tiles // grid_x
    y0 = tile_offset // grid_x
    ys = y0 + jnp.arange(n_rows, dtype=jnp.int32)            # [R]
    xs = jnp.arange(grid_x, dtype=jnp.int32)                 # [X]

    if n <= TR_BLOCK:
        counts2d = _rect_counts(ys, xs, rect_min, rect_wh, visible)
    else:
        k = (n + TR_BLOCK - 1) // TR_BLOCK
        npad = k * TR_BLOCK
        pad = npad - n
        rm = jnp.pad(rect_min, ((0, pad), (0, 0))).reshape(
            k, TR_BLOCK, 2)
        rw = jnp.pad(rect_wh, ((0, pad), (0, 0))).reshape(
            k, TR_BLOCK, 2)
        vis = jnp.pad(visible, (0, pad)).reshape(k, TR_BLOCK)

        def body(acc, blk):
            rm_b, rw_b, vis_b = blk
            return acc + _rect_counts(ys, xs, rm_b, rw_b, vis_b), None

        counts2d, _ = jax.lax.scan(
            body, jnp.zeros((n_rows, grid_x), jnp.float32), (rm, rw, vis))
    counts = counts2d.reshape(-1).astype(jnp.int32)          # [n_tiles]
    ends_all = jnp.cumsum(counts)
    tile_end = jnp.minimum(ends_all, M).astype(jnp.int32)
    tile_start = jnp.minimum(ends_all - counts, M).astype(jnp.int32)
    return tile_start, tile_end


# ---------------------------------------------------------------------------
# Fused expand + payload-carrying sort (the production path).
#
# bin_gaussians above materializes instance indices and then GATHERS the
# per-instance render attributes ([M]-sized gathers cost ~9-17 ms each at
# M=1e6 on v5e, and the [16, M] pack gather another ~14 ms). This path
# instead expands the raw attributes directly on the MXU (ops.expand) and
# carries them through ONE multi-operand lax.sort (~4 ms at M=1e6), so no
# [M] gather ever runs. The resulting instance order is IDENTICAL to
# bin_gaussians (same packed (tile, depth-rank) key), which itself equals
# the CUDA 64-bit radix order (rasterizer_impl.cu:230-240).
# ---------------------------------------------------------------------------

# kernel-table row indices produced by _sorted_pack_fwd (rows 0..9 are
# tile_render.ROW_*: conic a/b/c, xy, opacity, rgb, depth)
_ROW_EXC_HI, _ROW_EXC_LO, _ROW_W, _ROW_BASE, _ROW_GAUSS, _ROW_RANK = \
    range(10, 16)

# Instance→Gaussian gradient reduction backend for sorted_pack's VJP.
# "mxu" (default): inverse-permutation gather to rank order + windowed
# one-hot MXU segment reduction (ops.expand.reduce_instances) — the XLA
# scatter lowers to a ~292 ms serial loop at M=2^22 on v5e; the MXU path
# runs the same sums in a few ms. "scatter" keeps the old path for A/B.
REDUCE_IMPL = os.environ.get("RAIN_TPU_REDUCE", "mxu")
if REDUCE_IMPL not in ("mxu", "scatter"):
    raise ValueError(f"RAIN_TPU_REDUCE={REDUCE_IMPL!r} is not a valid "
                     f"reduction implementation; use 'mxu' or 'scatter'")


# At or above this Gaussian count, the depth permutation (and its
# inverse in the backward) is applied by payload-carrying sorts instead
# of column gathers: XLA's async-slice gather path serializes between
# N=1M and N=4M on v5e (a [16, 4.2M] column gather ran at ~105 ms,
# 65%+ of it serial, in the round-5 xplane trace) while a 14-operand
# payload sort of the same data costs ~45 ms. Below the threshold the
# async-slice gathers win (~2.6 ms at 262k vs ~2.9 ms sorted).
PERMUTE_SORT_MIN_N = int(os.environ.get("RAIN_TPU_PERMUTE_SORT_MIN_N",
                                        str(1 << 21)))


def _expand_chunk(max_instances: int) -> int:
    """Largest power-of-two chunk <= EXP_C that divides max_instances
    (0 if none >= 128 exists — caller falls back to the gather path)."""
    c = expand_ops.EXP_C
    while c >= 128:
        if max_instances % c == 0:
            return c
        c //= 2
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def sorted_pack(table10, tiles_touched, rect_min, rect_wh, tile_offset,
                grid_x: int, n_tiles: int, max_instances: int,
                need_depth: bool = True):
    """Tile-sorted [16, M] instance pack for ops.tile_render.composite.

    Args:
      table10: [10, N] f32 differentiable per-Gaussian attribute rows in
        the tile_render.ROW_* layout (conic a/b/c, GLOBAL pixel xy —
        including any xy_tap — opacity, rgb, depth).
      tiles_touched, rect_min, rect_wh: integer rect data (projection).
      tile_offset: int32 scalar — global tile id of local tile 0.
      grid_x, n_tiles, max_instances: static grid config.
      need_depth: static. False (training steps — the loss never reads
        the depth channel) zeroes the pack's depth row instead of
        carrying it through the [M] instance sort, saving one operand
        in the sort's traffic.

    Returns (pack [16, M], num_instances, overflow). Only table10
    receives a gradient — and its depth row NEVER does (the pack's
    depth-channel cotangent is ignored, exactly like the reference
    discarding grad_depth, dgr/__init__.py:96): the VJP is a
    deterministic per-Gaussian scatter-add of the sorted instance
    cotangents (the atomicAdd replacement, backward.cu:513-544).
    """
    out, _ = _sorted_pack_fwd(table10, tiles_touched, rect_min, rect_wh,
                              tile_offset, grid_x, n_tiles, max_instances,
                              need_depth)
    return out


def _sorted_pack_fwd(table10, tiles_touched, rect_min, rect_wh,
                     tile_offset, grid_x, n_tiles, max_instances,
                     need_depth=True):
    n = tiles_touched.shape[0]
    M = max_instances
    C = _expand_chunk(M)
    if not C:
        raise ValueError(
            f"max_instances={M} has no pow2 chunk divisor >= 128")

    visible = tiles_touched > 0
    depth_key = jnp.where(visible, table10[9], jnp.inf)
    # Attributes of culled Gaussians are zeroed: the expansion matmul
    # multiplies every window column by its 0/1 indicator, and 0 * inf
    # would poison the products.
    vis_f = visible.astype(jnp.float32)
    w_raw = jnp.maximum(rect_wh[:, 0], 1).astype(jnp.int32)
    base_raw = (rect_min[:, 1] * grid_x + rect_min[:, 0]).astype(jnp.int32)

    if n >= PERMUTE_SORT_MIN_N:
        # payload-carrying depth sort: (depth, original-index) is a
        # unique composite key, so the unstable sort equals the stable
        # argsort tie-break (== the CUDA radix order). One 13-operand
        # sort replaces argsort + the serial [16, N] column gather; the
        # depth attribute row is not carried — it is rebuilt from the
        # sort key (finite key == visible depth, inf == culled → 0).
        srt = jax.lax.sort(
            (depth_key, jnp.arange(n, dtype=jnp.int32))
            + tuple(table10[r] * vis_f for r in range(9))
            + (jnp.where(visible, tiles_touched, 0).astype(jnp.int32),
               w_raw, base_raw),
            dimension=0, is_stable=False, num_keys=2)
        order = srt[1]
        depth_d = jnp.where(jnp.isfinite(srt[0]), srt[0], 0.0)
        attrs_d = jnp.concatenate(
            [jnp.stack(srt[2:11]), depth_d[None]])   # [10, N] depth-ordered
        tiles_d = srt[11]
        w_d = srt[12].astype(jnp.float32)
        base_d = srt[13].astype(jnp.float32)
    else:
        order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)
        # 16-row per-Gaussian table in ORIGINAL order; rows 10.. carry
        # the integer rect streams as f32 so ONE column gather
        # depth-orders everything.
        table16 = jnp.concatenate([
            table10 * vis_f[None, :],
            tiles_touched.astype(jnp.float32)[None] * vis_f[None],
            jnp.zeros((1, n), jnp.float32),
            w_raw.astype(jnp.float32)[None],
            base_raw.astype(jnp.float32)[None],
            jnp.zeros((2, n), jnp.float32),
        ], axis=0)
        t, o = jax.lax.optimization_barrier((table16, order))
        table_d = jax.lax.optimization_barrier(jnp.take(t, o, axis=1))
        attrs_d = table_d[:10]
        tiles_d = table_d[10].astype(jnp.int32)
        w_d = table_d[12]
        base_d = table_d[13]

    offs = jnp.cumsum(tiles_d)                       # [N] inclusive
    total = offs[-1]
    exc = offs - tiles_d
    # exc can exceed 2^24 (not f32-exact): split into exact 12-bit halves
    ktable = jnp.concatenate([
        attrs_d,
        (exc >> 12).astype(jnp.float32)[None],
        (exc & 0xFFF).astype(jnp.float32)[None],
        w_d[None],
        base_d[None],
        order.astype(jnp.float32)[None],             # original index
        jnp.arange(n, dtype=jnp.float32)[None],      # depth rank
    ], axis=0)

    npad = (n // C + 2) * C
    ktable = jnp.pad(ktable, ((0, 0), (0, npad - n)))
    exc_p = jnp.pad(exc, (0, npad - n))[None, :]
    tiles_p = jnp.pad(tiles_d, (0, npad - n))[None, :]

    # per-chunk window block: rank at the chunk's first instance. Chunks
    # past the true instance count reuse the LAST real chunk's window
    # (their one-hots are empty either way) so wblk stays non-decreasing
    # with steps <= 1 — the reduction kernel's visited-block span and its
    # consecutive-revisit accumulation both rely on contiguity.
    kidx = jnp.arange(M // C, dtype=jnp.int32) * C
    kidx = jnp.minimum(kidx, jnp.maximum(total - 1, 0))
    wstart = jnp.searchsorted(offs, kidx, side="right").astype(jnp.int32)
    wblk = jnp.clip(wstart // C, 0, npad // C - 2).astype(jnp.int32)

    ex = expand_ops.expand_instances(ktable, exc_p, tiles_p, wblk, C=C)

    i = jnp.arange(M, dtype=jnp.int32)
    exc_i = (ex[_ROW_EXC_HI].astype(jnp.int32) << 12) | \
        ex[_ROW_EXC_LO].astype(jnp.int32)
    w_i = jnp.maximum(ex[_ROW_W].astype(jnp.int32), 1)
    base_i = ex[_ROW_BASE].astype(jnp.int32)
    local = i - exc_i
    dy = local // w_i
    dx = local - dy * w_i
    tile = base_i + dy * grid_x + dx - tile_offset
    valid = i < jnp.minimum(total, M)
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    rank = jnp.where(valid, ex[_ROW_RANK].astype(jnp.int32), 0)
    gauss = jnp.where(valid, ex[_ROW_GAUSS].astype(jnp.int32), n)

    rank_bits = max(int(n - 1).bit_length(), 1)
    n_attr = 10 if need_depth else 9
    attrs = tuple(ex[r] for r in range(n_attr))
    # the extra sort payload: the owning-Gaussian index for the scatter
    # reduction, or the pre-sort instance position (generated = rank
    # order) whose inverse permutation drives the MXU reduction
    extra = gauss if REDUCE_IMPL == "scatter" else \
        jnp.arange(M, dtype=jnp.int32)
    if (n_tiles + 1) << rank_bits <= 2 ** 31:
        # packed single-key unstable sort (keys unique — equals the
        # stable (tile, rank) order), carrying the attribute rows +
        # the reduction payload
        key = (tile << rank_bits) | rank
        out = jax.lax.sort((key,) + attrs + (extra,), dimension=0,
                           is_stable=False, num_keys=1)
    else:
        out = jax.lax.sort((tile, rank) + attrs + (extra,), dimension=0,
                           is_stable=False, num_keys=2)
    pack = jnp.concatenate([
        jnp.stack(out[-(n_attr + 1):-1]),
        jnp.zeros((16 - n_attr, M), jnp.float32)], axis=0)
    if REDUCE_IMPL == "scatter":
        res = (out[-1], n)
    else:
        # src_sorted[j] = generated-order (rank-order) position of the
        # tile-order instance j; the backward un-permutes its gradient
        # columns by sorting on it (an [M] gather by the inverse
        # permutation lowers to a ~119 ms serial loop at M=2^22 on v5e;
        # the payload sort runs in ~1/3 of that)
        src_sorted = out[-1]
        res = (src_sorted, order, exc_p, tiles_p, wblk, total)
    return (pack, total, total > M), res


def _sorted_pack_bwd(grid_x, n_tiles, max_instances, need_depth, res, cts):
    # The depth row (9) carries NO gradient by contract (reference
    # discards grad_depth, dgr/__init__.py:96; tile_render's VJP zeroes
    # that cotangent row) — all reductions below run on 9 rows and the
    # zero depth row is appended at the end.
    M = max_instances
    zi = lambda a_shape: np.zeros(a_shape, jax.dtypes.float0)  # noqa: E731
    if REDUCE_IMPL == "scatter":
        gauss_sorted, n = res
        d_pack = cts[0]
        # deterministic scatter-add reduction to per-Gaussian gradients
        # (dump index n from padding instances is dropped); the barriers
        # keep XLA from fusing the scatter into a serial loop
        g, idx = jax.lax.optimization_barrier((d_pack[:9], gauss_sorted))
        d9 = jnp.zeros((9, n), d_pack.dtype).at[:, idx].add(
            g, mode="drop")
        d9 = jax.lax.optimization_barrier(d9)
        d10 = jnp.concatenate([d9, jnp.zeros((1, n), d9.dtype)], axis=0)
        return (d10, zi((n,)), zi((n, 2)), zi((n, 2)), zi(()))

    src_sorted, order, exc_p, tiles_p, wblk, total = res
    n = order.shape[0]
    C = _expand_chunk(M)
    # un-permute gradient columns to rank (generated/depth) order by
    # sorting on the generated position carried through the forward sort.
    # Columns past the true instance count are unwritten kernel memory —
    # zero them (their one-hot rows are all-zero anyway, but 0·garbage
    # must not produce NaN).
    d_sorted = jax.lax.sort(
        (src_sorted,) + tuple(cts[0][r] for r in range(9)),
        dimension=0, is_stable=False, num_keys=1)
    valid = jnp.arange(M, dtype=jnp.int32) < jnp.minimum(total, M)
    d_rank = jnp.where(valid[None, :], jnp.stack(d_sorted[1:]), 0.0)
    d_depth = expand_ops.reduce_instances(d_rank, exc_p, tiles_p, wblk,
                                          C=C)
    # depth order → original Gaussian order. order is a permutation of
    # [0, n), so sorting the gradient columns keyed by it lands column g
    # at position g — a 10-operand payload sort, used at large N where
    # the permutation gather serializes (~105 ms at [10, 4.2M] on v5e).
    if n >= PERMUTE_SORT_MIN_N:
        dd = d_depth[:, :n]
        out = jax.lax.sort((order,) + tuple(dd[r] for r in range(9)),
                           dimension=0, is_stable=False, num_keys=1)
        d9 = jnp.stack(out[1:])
    else:
        # inv_order[g] = depth rank of Gaussian g (inverts order)
        inv_order = jax.lax.sort(
            (order, jnp.arange(n, dtype=jnp.int32)), dimension=0,
            is_stable=False, num_keys=1)[1]
        dd, iord = jax.lax.optimization_barrier(
            (d_depth[:, :n], inv_order))
        d9 = jax.lax.optimization_barrier(jnp.take(dd, iord, axis=1))
    d10 = jnp.concatenate([d9, jnp.zeros((1, n), d9.dtype)], axis=0)
    return (d10, zi((n,)), zi((n, 2)), zi((n, 2)), zi(()))


sorted_pack.defvjp(_sorted_pack_fwd, _sorted_pack_bwd)
