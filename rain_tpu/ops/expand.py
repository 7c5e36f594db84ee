"""Windowed one-hot MXU instance expansion.

Replaces the rank-indexed [M] gathers of the binning stage (the TPU
analogue of duplicateWithKeys, cuda_rasterizer/rasterizer_impl.cu:269-290)
with a Pallas kernel that SELECTS each instance's per-Gaussian data via a
small matmul. Arbitrary [M] gathers lower to ~9-17 ms serial loops at
M=1e6 on v5e; this kernel streams the same data through the MXU in ~2 ms.

Key structural fact: instances are generated in depth order, so the
owning-Gaussian index ("rank") is NON-DECREASING in the instance index i,
with increments of exactly 0 or 1 inside the live region (every visible
Gaussian owns >= 1 instance). Hence a chunk of C consecutive instances is
owned by a window of at most C consecutive depth-ordered Gaussians, and
the expansion restricted to a chunk is

    out[:, c] = table[:, g(c)]  =  table_window @ onehot_window[:, c]

with the one-hot built on the VPU from the interval test
exc[g] <= i < exc[g] + tiles[g] (exc = exclusive prefix sum of per-
Gaussian tile counts in depth order). One [16, 2C] x [2C, C] matmul per
chunk selects everything — attributes AND integer streams (stored as
f32; values that can exceed 2^24 are split into exact 12-bit halves).

The per-chunk window start only needs the rank at chunk boundaries
(searchsorted over [M/C] points), not a full [M] bump-scatter + cumsum.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Instances per expansion chunk (output block). The Gaussian window per
# chunk is 2*C columns (two aligned C-blocks always cover a span of C).
# v5e A/B across all garden population tiers: 256 beats 512 by 1.5-4%
# and 1024 by ~10% (smaller [16, 2C] x [2C, C] selection matmuls win
# over fewer grid steps).
EXP_C = int(os.environ.get("RAIN_TPU_EXPAND_CHUNK", "256"))

_f32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


def _kernel(C, wblk_ref, tab0, tab1, exc0, exc1, til0, til1, out_ref):
    del wblk_ref  # consumed by the index maps
    k = pl.program_id(0)
    i = k * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

    def half(tab, exc, til):
        # ohT[c, w] = 1 iff window-Gaussian w owns instance i_c;
        # out[r, c] = sum_w tab[r, w] * ohT[c, w]: at most one nonzero
        # term per column, so the f32 (HIGHEST) matmul is exact
        # selection. (Two half-window matmuls instead of one concat'd
        # [16, 2C] — Mosaic cannot concatenate offset vectors.)
        e = exc[0:1, :]
        t = til[0:1, :]
        oht = ((e <= i) & (i < e + t)).astype(_f32)           # [C, C]
        return jax.lax.dot_general(
            tab[:], oht, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_f32, precision=_HI)

    out_ref[:] = half(tab0, exc0, til0) + half(tab1, exc1, til1)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("C", "interpret"))
def expand_instances(table: jnp.ndarray, exc: jnp.ndarray,
                     tiles: jnp.ndarray, wblk: jnp.ndarray,
                     *, C: int = EXP_C,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Expand depth-ordered per-Gaussian columns to per-instance columns.

    Args:
      table: [16, Npad] f32, depth-ordered per-Gaussian rows; columns
        >= n_visible must be zero (zero-padded), Npad a multiple of C
        with 2 extra blocks of slack (see sorted-pack caller).
      exc:   [1, Npad] int32 exclusive prefix sum of tiles (depth order).
      tiles: [1, Npad] int32 per-Gaussian tile counts (0 past n_visible).
      wblk:  [M // C] int32 aligned window block index per chunk:
        clamp(rank(k*C) // C, 0, Npad//C - 2).
      C: static chunk width (instances per grid program).

    Returns [16, M] f32: column i = table column of the Gaussian owning
    instance i (zero for i >= num_instances — no owner).
    """
    if interpret is None:
        interpret = _interpret_default()
    n_chunks = wblk.shape[0]
    npad = table.shape[1]
    if npad < 2 * C or npad % C:
        raise ValueError(f"table must be padded to a multiple of C={C}, "
                         f"got {npad}")
    m = n_chunks * C

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((16, C), lambda k, w: (0, w[k])),
            pl.BlockSpec((16, C), lambda k, w: (0, w[k] + 1)),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k])),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k] + 1)),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k])),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k] + 1)),
        ],
        out_specs=pl.BlockSpec((16, C), lambda k, w: (0, k)),
    )
    try:
        params = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:
        params = pltpu.CompilerParams()
    return pl.pallas_call(
        functools.partial(_kernel, C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, m), _f32),
        compiler_params=params,
        interpret=interpret,
    )(wblk, table, table, exc, exc, tiles, tiles)


# ---------------------------------------------------------------------------
# The transpose: windowed one-hot MXU instance REDUCTION.
#
# The VJP of expansion is a segmented sum of per-instance gradient columns
# back to their owning Gaussian. As an XLA scatter-add this lowers to a
# serial per-column loop (~292 ms at M=2^22 on v5e — 65% of the whole
# train step); here the same sums run on the MXU as the transposed
# selection matmul: for a chunk of C rank-ordered instance gradients,
# d_window[r, w] = Σ_c d[r, c] · onehot[c, w] with the identical interval
# one-hot the forward uses. Chunk windows advance monotonically (rank
# increments are 0/1), so each output block is visited by one contiguous
# run of grid steps and accumulates in VMEM (the deterministic replacement
# of the CUDA atomicAdd reduction, backward.cu:513-544).
# ---------------------------------------------------------------------------


def _reduce_kernel(C, rows, wblk_ref, d_ref, exc0, exc1, til0, til1,
                   out0, out1):
    del rows  # encoded in the block shapes
    k = pl.program_id(0)
    i = k * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    prev = wblk_ref[jnp.maximum(k - 1, 0)]
    first = (k == 0) | (wblk_ref[k] != prev)

    def half(exc, til):
        # oht[c, w] = 1 iff window-Gaussian w owns instance i_c; summing
        # d over c per w is the exact per-Gaussian segment sum (each
        # instance owned by exactly one Gaussian)
        e = exc[0:1, :]
        t = til[0:1, :]
        oht = ((e <= i) & (i < e + t)).astype(_f32)           # [C, C]
        return jax.lax.dot_general(
            d_ref[:], oht, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_f32, precision=_HI)

    h0 = half(exc0, til0)
    h1 = half(exc1, til1)

    # out blocks revisit consecutively (wblk non-decreasing, steps of
    # <= 1): zero the VMEM buffer at each block's first visit, then
    # accumulate across the run
    @pl.when(first)
    def _():
        out0[:] = jnp.zeros_like(out0)
        out1[:] = jnp.zeros_like(out1)

    out0[:] += h0
    out1[:] += h1


@functools.partial(jax.jit, static_argnames=("C", "interpret"))
def reduce_instances(d: jnp.ndarray, exc: jnp.ndarray, tiles: jnp.ndarray,
                     wblk: jnp.ndarray, *, C: int = EXP_C,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Reduce per-instance gradient columns to per-Gaussian columns.

    Args:
      d: [rows, M] f32 gradient columns in RANK (generated/depth) order
        (rows is typically 10 — the differentiable pack rows); columns
        >= num_instances must already be zeroed.
      exc, tiles, wblk: exactly the forward expansion's operands.

    Returns [rows, Npad] f32: column g = Σ_{i owned by g} d[:, i] (zero
    for Gaussian blocks outside [wblk[0], wblk[-1] + 1] — all zero-grad).
    """
    if interpret is None:
        interpret = _interpret_default()
    rows = d.shape[0]
    n_chunks = wblk.shape[0]
    npad = exc.shape[1]
    if npad < 2 * C or npad % C:
        raise ValueError(f"exc must be padded to a multiple of C={C}, "
                         f"got {npad}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((rows, C), lambda k, w: (0, k)),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k])),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k] + 1)),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k])),
            pl.BlockSpec((1, C), lambda k, w: (0, w[k] + 1)),
        ],
        out_specs=[
            pl.BlockSpec((rows, C), lambda k, w: (0, w[k])),
            pl.BlockSpec((rows, C), lambda k, w: (0, w[k] + 1)),
        ],
    )
    try:
        params = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:
        params = pltpu.CompilerParams()
    out0, out1 = pl.pallas_call(
        functools.partial(_reduce_kernel, C, rows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, npad), _f32),
                   jax.ShapeDtypeStruct((rows, npad), _f32)],
        compiler_params=params,
        interpret=interpret,
    )(wblk, d, exc, exc, tiles, tiles)
    # blocks never visited hold uninitialized memory — mask to the
    # contiguous visited span before summing the two half contributions
    blk = jnp.arange(npad, dtype=jnp.int32) // C
    vis0 = (blk >= wblk[0]) & (blk <= wblk[-1])
    vis1 = (blk >= wblk[0] + 1) & (blk <= wblk[-1] + 1)
    return (jnp.where(vis0[None, :], out0, 0.0) +
            jnp.where(vis1[None, :], out1, 0.0))
