"""Pallas TPU tile compositor: forward + analytic backward, custom VJP.

TPU-native re-design of the CUDA render kernels
(cuda_rasterizer/forward.cu:251-369, backward.cu:389-547). The CUDA code
walks each 16x16 tile's depth-sorted list sequentially per pixel with warp
early-exit and atomicAdd gradient reduction. Neither maps to TPU, so the
same math is reformulated for the MXU/VPU:

- The Gaussian falloff power is a quadratic in the (tile-local) pixel
  coordinates, so a whole 256-instance chunk's powers for all 256 pixels is
  ONE matmul: power[256px, 256inst] = PixQuad[256, 8] @ Coef[8, 256], where
  Coef rows are per-instance quadratic coefficients. The coefficients are
  derived IN-KERNEL from the raw per-instance rows (conic a/b/c + global
  pixel-space mean) and the tile's origin (program id + prefetched tile
  offset): tile-local coordinates keep the quadratic expansion numerically
  safe in f32, and the host-side instance stream stays raw per-Gaussian
  data — one row-gather, no per-instance XLA math, no giant transpose of
  derived quantities.
- Front-to-back alpha compositing is associative: with per-instance
  one-minus-alpha factors, the per-instance incoming transmittance T_in is
  a cumulative product along the instance (lane) axis — a log2(K)-step
  Hillis-Steele scan on the VPU — instead of a sequential loop.
- The early-termination rule (stop when T*(1-a) < 1e-4, forward.cu:339-344)
  becomes a mask: inclusion = (cumulative T after this instance) >= 1e-4,
  which is exactly equivalent because the cumulative product is monotone
  non-increasing; the surviving transmittance is frozen by replacing
  excluded factors with 1.
- Color/depth accumulation is a second matmul:
  Out[256, 8] += W[256, 256] @ Feat[256, 8] with W = alpha * T_in.
- The backward pass re-derives the reference gradients without atomics:
  per-pixel suffix sums of composited contributions (a lane-axis scan, the
  counterpart of the reference's back-to-front accum_rec recurrence,
  backward.cu:505-509) give dL/dalpha in closed form, and per-instance
  gradients are deterministic column reductions + matmuls. The suffix-sum
  seed per pixel is C·g (the forward color dotted with the cotangent), so
  the backward is single-pass. Per-instance gradients are written to HBM
  compactly (column i = instance i; adjacent tiles' shared 256-aligned
  boundary windows are merged through a persistent-VMEM carry across the
  sequentially-executed grid programs) and reduced to per-Gaussian
  gradients by XLA's (deterministic) gather transpose — replacing
  atomicAdd (backward.cu:513-544).

Alpha semantics match the reference bit-for-bit in structure:
  alpha = min(0.99, opacity * exp(power)); skip if power > 0 or
  alpha < 1/255; the 0.99 clamp passes gradient through (the reference
  backward applies no clamp gate, backward.cu:528,544). The depth channel
  and the auxiliary alpha/n_contrib channels carry no gradient (the
  reference ignores grad_depth, dgr/__init__.py:96).

The instance stream is consumed in aligned 256-wide chunks, double-buffered
HBM→VMEM; per-tile [start, end) ranges arrive via scalar prefetch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE          # pixels per tile
# Instances per inner step (lane axis). Tile instance ranges average only
# ~140 at garden scale, so smaller chunks waste fewer lanes on range
# padding at the cost of more loop iterations; 256 measured best on v5e
# (env knob for A/B experiments).
CHUNK = int(os.environ.get("RAIN_TPU_CHUNK", "256"))
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_CLAMP = 0.99

# Output tile channels.
CH_R, CH_G, CH_B, CH_DEPTH, CH_ALPHA, CH_T, CH_NCONTRIB, CH_PAD = range(8)

# Instance-pack rows (raw per-Gaussian data, [16, M] layout):
#   0: conic a   1: conic b   2: conic c
#   3: xg (global pixel x)    4: yg (global pixel y)
#   5: opacity   6..8: rgb    9: depth   10..15: zero padding
ROW_A, ROW_B, ROW_C, ROW_XG, ROW_YG, ROW_OP, ROW_R, ROW_G, ROW_B2, \
    ROW_DEPTH = range(10)

_f32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


def _pixquad() -> np.ndarray:
    """[P, 8] per-pixel quadratic basis in tile-local coords.

    Columns: [px^2, py^2, px*py, px, py, 1, 0, 0] for pixel p = py*16 + px.
    """
    p = np.arange(P)
    px = (p % TILE).astype(np.float32)
    py = (p // TILE).astype(np.float32)
    q = np.zeros((P, 8), np.float32)
    q[:, 0] = px * px
    q[:, 1] = py * py
    q[:, 2] = px * py
    q[:, 3] = px
    q[:, 4] = py
    q[:, 5] = 1.0
    return q


def pack_rows(xy, conic, opacity, color, depth):
    """Raw per-Gaussian (or per-instance) rows in the [16, N] kernel
    layout (see ROW_* above); xy is in GLOBAL pixel coordinates — the
    kernel shifts to tile-local itself."""
    z = jnp.zeros_like(depth)
    return jnp.stack([
        conic[:, 0], conic[:, 1], conic[:, 2],
        xy[:, 0], xy[:, 1],
        opacity,
        color[:, 0], color[:, 1], color[:, 2],
        depth,
        z, z, z, z, z, z,
    ], axis=0)


def _cumprod_lanes(x):
    """Inclusive cumulative product along the last (lane) axis."""
    k = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=len(x.shape) - 1)
        x = x * jnp.where(col >= s, shifted, 1.0)
        s *= 2
    return x


def _exclusive_from_inclusive(cum):
    """Exclusive cumulative product from the inclusive one (one lane roll
    + select instead of a per-element divide, which costs ~10x more VPU
    cycles than a multiply)."""
    col = jax.lax.broadcasted_iota(jnp.int32, cum.shape, len(cum.shape) - 1)
    return jnp.where(col >= 1,
                     pltpu.roll(cum, shift=1, axis=len(cum.shape) - 1),
                     1.0)


def _cumsum_lanes(x):
    """Inclusive cumulative sum along the last (lane) axis."""
    k = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=len(x.shape) - 1)
        x = x + jnp.where(col >= s, shifted, 0.0)
        s *= 2
    return x


def _chunk_terms(pack_c, pixquad, ox, oy, start, end, gidx0):
    """Shared fwd/bwd chunk math for one [P, CHUNK] block.

    Derives the tile-local quadratic coefficients from the raw rows and
    the tile origin (ox, oy), then alpha with the reference skip rules
    (power > 0, alpha < 1/255, out-of-range lanes → alpha = 0).

    Returns (G, alpha, om, gidx, xgl, ygl) — xgl/ygl are [1, CHUNK]
    tile-local means reused by the backward.
    """
    a = pack_c[ROW_A:ROW_A + 1, :]
    b = pack_c[ROW_B:ROW_B + 1, :]
    c = pack_c[ROW_C:ROW_C + 1, :]
    xgl = pack_c[ROW_XG:ROW_XG + 1, :] - ox
    ygl = pack_c[ROW_YG:ROW_YG + 1, :] - oy
    op = pack_c[ROW_OP:ROW_OP + 1, :]
    zero = jnp.zeros_like(a)
    coef = jnp.concatenate([
        -0.5 * a,
        -0.5 * c,
        -b,
        a * xgl + b * ygl,
        c * ygl + b * xgl,
        -0.5 * (a * xgl * xgl + c * ygl * ygl) - b * xgl * ygl,
        zero, zero,
    ], axis=0)                                           # [8, CHUNK]
    power = jnp.dot(pixquad, coef, preferred_element_type=_f32,
                    precision=_HI)
    G = jnp.exp(power)
    alpha = jnp.minimum(op * G, ALPHA_CLAMP)
    lane = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    gidx = gidx0 + lane
    valid = (gidx >= start) & (gidx < end)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN) | ~valid,
                      0.0, alpha)
    return G, alpha, 1.0 - alpha, gidx, xgl, ygl


def _feat8(pack_c):
    """[8, CHUNK] feature rows for the accumulation matmul:
    [r, g, b, depth, 1, 0, 0, 0] → output channels
    [r, g, b, depth, alpha, 0, 0, 0]."""
    ones = jnp.ones_like(pack_c[0:1, :])
    zero = jnp.zeros_like(pack_c[0:3, :])
    return jnp.concatenate([pack_c[ROW_R:ROW_DEPTH + 1, :], ones, zero],
                           axis=0)


def _origin(t, toff_ref, grid_x):
    gt = t + toff_ref[0]
    ox = (jax.lax.rem(gt, grid_x) * TILE).astype(_f32)
    oy = (jax.lax.div(gt, grid_x) * TILE).astype(_f32)
    return ox, oy


def _fwd_kernel(grid_x, starts_ref, ends_ref, toff_ref, pack_hbm,
                pixquad_ref, out_ref, buf, sem, acc_ref):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    a_start = (start // CHUNK) * CHUNK
    nchunks = (end - a_start + CHUNK - 1) // CHUNK
    ox, oy = _origin(t, toff_ref, grid_x)

    def dma(slot, c):
        off = pl.multiple_of(a_start + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            pack_hbm.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    acc_ref[:] = jnp.zeros((P, 8), _f32)
    pixquad = pixquad_ref[:]

    def body(c, carry):
        t_vec, nc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            dma(jax.lax.rem(c + 1, 2), c + 1).start()

        dma(slot, c).wait()

        def compute(carry):
            t_vec, nc = carry
            pack_c = buf[slot]
            _, alpha, om, gidx, _, _ = _chunk_terms(
                pack_c, pixquad, ox, oy, start, end, a_start + c * CHUNK)
            cum = _cumprod_lanes(om)
            t_after = t_vec * cum
            t_in = t_vec * _exclusive_from_inclusive(cum)
            m = t_after >= T_EPS
            w = jnp.where(m, alpha * t_in, 0.0)
            acc_ref[:] += jax.lax.dot_general(
                w, _feat8(pack_c),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=_f32, precision=_HI)
            # frozen transmittance = t_after at the last in-threshold
            # lane (monotone decreasing), = min over masked lanes;
            # t_vec if no lane passes. (reduce_prod is unsupported in
            # Mosaic; this min is exactly equivalent.)
            t_new = jnp.min(jnp.where(m, t_after, t_vec), axis=1,
                            keepdims=True)
            pos = jnp.where(w > 0.0,
                            (gidx - start + 1).astype(_f32), 0.0)
            nc_new = jnp.maximum(nc, jnp.max(pos, axis=1, keepdims=True))
            return (t_new, nc_new)

        return jax.lax.cond(jnp.all(t_vec < T_EPS),
                            lambda cr: cr, compute, (t_vec, nc))

    init = (jnp.ones((P, 1), _f32), jnp.zeros((P, 1), _f32))
    t_vec, nc = jax.lax.fori_loop(0, nchunks, body, init)

    acc = acc_ref[:]
    out_ref[0] = jnp.concatenate(
        [acc[:, 0:5], t_vec, nc, jnp.zeros((P, 1), _f32)], axis=1)


def _bwd_kernel(grid_x, starts_ref, ends_ref, toff_ref, pack_hbm,
                pixquad_ref, tiles_ref, gtile_ref, gout_ref, buf, obuf,
                carry_ref, sem, osem, csem, st_ref):
    # Gradient output layout: COMPACT — gout[:, i] is instance i's
    # gradient column. Mosaic requires CHUNK-aligned dynamic offsets, and
    # two adjacent tiles' aligned windows share at most one boundary
    # window (tile t's first window == tile t-1's last window unless the
    # range boundary is CHUNK-aligned). Because the TPU grid executes
    # programs sequentially, the kernel holds each tile's LAST gradient
    # chunk in persistent VMEM scratch (carry_ref) instead of writing it;
    # the next non-empty tile either merges it into its own first chunk
    # (lane-disjoint contributions, so a plain add) or flushes it if its
    # windows don't overlap. This replaces the round-1 expanded layout
    # whose transpose + 4M-row gather epilogue dominated the backward.
    # st_ref (SMEM): [0] = carried window base, [1] = carried valid flag,
    # [2] = carry-flush DMA pending.
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    a_start = (start // CHUNK) * CHUNK
    nchunks = jnp.where(end > start,
                        (end - a_start + CHUNK - 1) // CHUNK, 0)
    ox, oy = _origin(t, toff_ref, grid_x)

    @pl.when(t == 0)
    def _():
        st_ref[1] = 0
        st_ref[2] = 0

    def dma_in(slot, c):
        off = pl.multiple_of(a_start + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            pack_hbm.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

    def dma_out(slot, base):
        off = pl.multiple_of(base, CHUNK)
        return pltpu.make_async_copy(
            obuf.at[slot], gout_ref.at[:, pl.ds(off, CHUNK)], osem.at[slot])

    def dma_carry_flush():
        off = pl.multiple_of(st_ref[0], CHUNK)
        return pltpu.make_async_copy(
            carry_ref, gout_ref.at[:, pl.ds(off, CHUNK)], csem)

    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    merge_first = (st_ref[1] == 1) & (st_ref[0] == a_start) & (nchunks > 0)
    flush_now = (st_ref[1] == 1) & (nchunks > 0) & ~merge_first

    # carried window disjoint from this tile's windows → flush it now
    @pl.when(flush_now)
    def _():
        dma_carry_flush().start()
        st_ref[2] = 1

    pixquad = pixquad_ref[:]
    tile_out = tiles_ref[0]                    # [P, 8] forward outputs
    g_all = gtile_ref[0]                       # [P, 8] cotangents
    # Only the color channels and the final-transmittance channel are
    # differentiable (depth/alpha/n_contrib are not, like the reference).
    zeros5 = jnp.zeros((P, 5), _f32)
    g8 = jnp.concatenate([g_all[:, 0:3], zeros5], axis=1)
    g_t = g_all[:, CH_T:CH_T + 1]              # [P, 1]
    t_final = tile_out[:, CH_T:CH_T + 1]       # [P, 1]
    # Seed of the per-pixel suffix sums: total composited contribution
    # dotted with the cotangent = C · g (forward color, pre-background).
    r0 = jnp.sum(tile_out[:, 0:3] * g_all[:, 0:3], axis=1, keepdims=True)

    def body(c, carry):
        t_vec, r_vec = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            dma_in(jax.lax.rem(c + 1, 2), c + 1).start()

        dma_in(slot, c).wait()

        def compute(carry):
            t_vec, r_vec = carry
            pack_c = buf[slot]
            G, alpha, om, _, xgl, ygl = _chunk_terms(
                pack_c, pixquad, ox, oy, start, end, a_start + c * CHUNK)
            cum = _cumprod_lanes(om)
            t_after = t_vec * cum
            t_in = t_vec * _exclusive_from_inclusive(cum)
            m = t_after >= T_EPS
            w = jnp.where(m, alpha * t_in, 0.0)

            # cg[p, k] = sum_ch g[p, ch] * color[ch, k]
            cg = jax.lax.dot_general(
                g8, _feat8(pack_c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=_f32, precision=_HI)
            v = w * cg
            s_after = r_vec - _cumsum_lanes(v)
            active = m & (alpha > 0.0)
            dalpha = jnp.where(
                active,
                t_in * cg - (s_after + t_final * g_t) / om,
                0.0)

            op = pack_c[ROW_OP:ROW_OP + 1, :]
            a = pack_c[ROW_A:ROW_A + 1, :]
            b = pack_c[ROW_B:ROW_B + 1, :]
            cc = pack_c[ROW_C:ROW_C + 1, :]
            gd2 = dalpha * G                   # dL/dG * G / opacity

            # All geometric gradient rows are per-pixel moment sums of
            # gd2 against the same quadratic basis the forward uses:
            # S = pixquadT @ gd2 -> rows [S·px², S·py², S·px·py, S·px,
            # S·py, S, 0, 0]. One MXU matmul replaces the 6 masked
            # [P, CHUNK] products + sublane colsum reductions of the
            # naive form (dx/dy are affine in px/py, so every Σ gd·poly
            # (dx, dy) expands in these moments).
            S = jax.lax.dot_general(
                pixquad, gd2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=_f32, precision=_HI)
            s_xx, s_yy, s_xy = S[0:1], S[1:2], S[2:3]
            s_x, s_y, s_1 = S[3:4], S[4:5], S[5:6]
            # Σ gd2·dx = xgl·Σgd2 − Σgd2·px, etc. (dx = xgl − px)
            e_x = xgl * s_1 - s_x
            e_y = ygl * s_1 - s_y
            e_xx = xgl * xgl * s_1 - 2.0 * xgl * s_x + s_xx
            e_yy = ygl * ygl * s_1 - 2.0 * ygl * s_y + s_yy
            e_xy = xgl * ygl * s_1 - xgl * s_y - ygl * s_x + s_xy

            # color grads: Σ_p w·g_c = g_rgbT @ w — second small matmul
            crgb = jax.lax.dot_general(
                g8[:, 0:3], w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=_f32, precision=_HI)

            grows = jnp.concatenate([
                -op * (a * e_x + b * e_y),             # d xg
                -op * (cc * e_y + b * e_x),            # d yg
                -0.5 * op * e_xx,                      # d conic a
                -op * e_xy,                            # d conic b
                -0.5 * op * e_yy,                      # d conic c
                s_1,                                   # d opacity
                crgb,                                  # d color r, g, b
                jnp.zeros((7, CHUNK), _f32),
            ], axis=0)
            t_new = jnp.min(jnp.where(m, t_after, t_vec), axis=1,
                            keepdims=True)
            r_new = r_vec - jnp.sum(v, axis=1, keepdims=True)
            return (t_new, r_new, grows)

        def skip(carry):
            return (carry[0], carry[1], jnp.zeros((16, CHUNK), _f32))

        t_new, r_new, grows = jax.lax.cond(
            jnp.all(t_vec < T_EPS), skip, compute, (t_vec, r_vec))

        # merge the previous tile's held boundary window into this tile's
        # first chunk (lane-disjoint instance ranges → plain add)
        grows = jnp.where(merge_first & (c == 0),
                          grows + carry_ref[:], grows)

        @pl.when(c == nchunks - 1)
        def _():
            # hold this tile's last window in the carry (flushed/merged by
            # a later program); wait for any pending flush of the OLD
            # carry before overwriting the buffer
            @pl.when(st_ref[2] == 1)
            def _():
                dma_carry_flush().wait()
                st_ref[2] = 0
            carry_ref[:] = grows
            # update carried-window metadata AFTER the flush used st_ref[0]
            st_ref[0] = a_start + c * CHUNK
            st_ref[1] = 1

        @pl.when(c < nchunks - 1)
        def _():
            @pl.when(c >= 2)
            def _():
                dma_out(slot, a_start + (c - 2) * CHUNK).wait()

            obuf[slot] = grows
            dma_out(slot, a_start + c * CHUNK).start()

        return (t_new, r_new)

    init = (jnp.ones((P, 1), _f32), r0)
    jax.lax.fori_loop(0, nchunks, body, init)

    # drain this tile's outstanding non-carry output DMAs (flushed chunks
    # are c in [0, nchunks-1))
    nflushed = jnp.maximum(nchunks - 1, 0)

    @pl.when(nflushed >= 2)
    def _():
        dma_out(jax.lax.rem(nflushed - 2, 2),
                a_start + (nflushed - 2) * CHUNK).wait()

    @pl.when(nflushed >= 1)
    def _():
        dma_out(jax.lax.rem(nflushed - 1, 2),
                a_start + (nflushed - 1) * CHUNK).wait()

    # last program: flush the held carry and drain any pending flush
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        @pl.when(st_ref[2] == 1)
        def _():
            dma_carry_flush().wait()
            st_ref[2] = 0

        @pl.when(st_ref[1] == 1)
        def _():
            dma_carry_flush().start()
            dma_carry_flush().wait()


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    try:
        return pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:  # older/newer param spelling
        return pltpu.CompilerParams()


@functools.partial(jax.jit, static_argnames=("grid_x", "interpret"))
def _composite_fwd_impl(pack, starts, ends, toff, *, grid_x: int,
                        interpret: bool):
    n_tiles = starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((P, 8), _f32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 8), _f32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(starts, ends, toff, pack, jnp.asarray(_pixquad()))


@functools.partial(jax.jit, static_argnames=("grid_x", "interpret"))
def _composite_bwd_impl(pack, starts, ends, toff, tiles, gtile, *,
                        grid_x: int, interpret: bool):
    n_tiles = starts.shape[0]
    m_pad = pack.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), _f32),     # input double buffer
            pltpu.VMEM((2, 16, CHUNK), _f32),     # output double buffer
            pltpu.VMEM((16, CHUNK), _f32),        # carried boundary window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,              # carry-flush semaphore
            pltpu.SMEM((3,), jnp.int32),          # carry base/valid/pending
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, m_pad), _f32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(starts, ends, toff, pack, jnp.asarray(_pixquad()), tiles, gtile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def composite(pack, starts, ends, toff, grid_x):
    """Composite sorted instances into per-tile images.

    Args (M = instance capacity; pack already gathered in tile-sorted
    order, see ops.binning):
      pack: [16, M (+pad)] raw per-instance rows (see ROW_* / pack_rows):
        conic a/b/c, GLOBAL pixel-space mean, opacity, rgb, depth.
      starts, ends: [n_tiles] int32 instance ranges per (local) tile.
      toff: [1] int32 global tile id of local tile 0 (tile-row sharding);
        the kernel derives each tile's pixel origin from it.
      grid_x: static tile-grid width.

    Returns:
      tiles [n_tiles, 256, 8] float32; channels
      [r, g, b, depth, alpha_sum, final_T, n_contrib, pad]. Background is
      NOT applied (callers add final_T * bg, which keeps the reference's
      background gradient term, backward.cu:521-524, flowing through the
      final_T channel's cotangent). Only r/g/b/final_T are differentiable,
      and of the pack rows only xg/yg, conic, opacity, and rgb receive
      gradients (depth does not, like the reference).
    """
    out, _ = _composite_fwd(pack, starts, ends, toff, grid_x)
    return out


def _composite_fwd(pack, starts, ends, toff, grid_x):
    tiles = _composite_fwd_impl(pack, starts, ends, toff, grid_x=grid_x,
                                interpret=_interpret_default())
    return tiles, (pack, starts, ends, toff, tiles)


def _composite_bwd(grid_x, res, gtile):
    pack, starts, ends, toff, tiles = res
    grads = _composite_bwd_impl(pack, starts, ends, toff, tiles, gtile,
                                grid_x=grid_x,
                                interpret=_interpret_default())
    # compact layout: column i is instance i's gradient; columns at/after
    # the true instance count were never written (mask off the garbage).
    # Gradient rows are [d_xg, d_yg, d_a, d_b, d_c, d_op, d_r, d_g, d_b2]
    # (see _bwd_kernel grows); scatter them back into the pack-row layout.
    m = pack.shape[1]
    covered = jnp.arange(m, dtype=jnp.int32) < jnp.max(ends)
    g = jnp.where(covered[None, :], grads, 0.0)
    zero = jnp.zeros_like(g[0:1])
    d_pack = jnp.concatenate([
        g[2:3], g[3:4], g[4:5],      # conic a, b, c
        g[0:1], g[1:2],              # xg, yg
        g[5:6],                      # opacity
        g[6:9],                      # rgb
        zero,                        # depth (non-differentiable)
        jnp.zeros((6, m), _f32),
    ], axis=0)
    zi = np.zeros(starts.shape, jax.dtypes.float0)
    zt = np.zeros(toff.shape, jax.dtypes.float0)
    return (d_pack, zi, zi, zt)


composite.defvjp(_composite_fwd, _composite_bwd)
