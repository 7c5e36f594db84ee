"""Pallas TPU tile compositor: forward + analytic backward, custom VJP.

TPU-native re-design of the CUDA render kernels
(cuda_rasterizer/forward.cu:251-369, backward.cu:389-547). The CUDA code
walks each 16x16 tile's depth-sorted list sequentially per pixel with warp
early-exit and atomicAdd gradient reduction. Neither maps to TPU, so the
same math is reformulated for the MXU/VPU:

- The Gaussian falloff power is a quadratic in the (tile-local) pixel
  coordinates, so a whole 256-instance chunk's powers for all 256 pixels is
  ONE matmul: power[256px, 256inst] = PixQuad[256, 8] @ Coef[8, 256], where
  Coef rows are per-instance quadratic coefficients (packed in XLA).
  Tile-local coordinates keep the expansion numerically safe in f32.
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
  and reduced to per-Gaussian gradients by XLA's (deterministic) gather
  transpose — replacing atomicAdd (backward.cu:513-544).

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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE          # pixels per tile
CHUNK = 256              # instances per inner step (lane axis)
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_CLAMP = 0.99

# Output tile channels.
CH_R, CH_G, CH_B, CH_DEPTH, CH_ALPHA, CH_T, CH_NCONTRIB, CH_PAD = range(8)

_f32 = jnp.float32


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


def pack_instances(xy_local, conic, opacity, color, depth):
    """Pack per-instance data into the [16, M] kernel layout.

    Rows 0..7 feed the power matmul (quadratic coefficients + opacity);
    rows 8..15 feed the output matmul / backward:
      [cxx, cyy, cxy, cx, cy, c0, opacity, 0,
       r, g, b, depth, 1, xg_local, yg_local, 0]
    The quadratic expansion of the reference falloff
    power = -0.5*a*dx^2 - 0.5*c*dy^2 - b*dx*dy with dx = xg - px
    (forward.cu:326-328) in pixel basis [px^2, py^2, px*py, px, py, 1].
    """
    xg, yg = xy_local[:, 0], xy_local[:, 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    rows = [
        -0.5 * a,
        -0.5 * c,
        -b,
        a * xg + b * yg,
        c * yg + b * xg,
        -0.5 * (a * xg * xg + c * yg * yg) - b * xg * yg,
        opacity,
        jnp.zeros_like(a),
        color[:, 0], color[:, 1], color[:, 2],
        depth,
        jnp.ones_like(a),
        xg, yg,
        jnp.zeros_like(a),
    ]
    return jnp.stack(rows, axis=0)


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


def _chunk_alpha(pack_c, pixquad, start, end, gidx0):
    """Shared fwd/bwd chunk math: alpha and friends for one 256x256 block.

    Returns (power, G, alpha, om) each [P, CHUNK]; alpha is zeroed for
    skipped instances (power>0, alpha<1/255, out-of-range lanes).
    """
    power = jnp.dot(pixquad, pack_c[0:8, :], preferred_element_type=_f32,
                    precision=jax.lax.Precision.HIGHEST)
    op = pack_c[6:7, :]
    G = jnp.exp(power)
    alpha = jnp.minimum(op * G, ALPHA_CLAMP)
    lane = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    gidx = gidx0 + lane
    valid = (gidx >= start) & (gidx < end)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN) | ~valid,
                      0.0, alpha)
    return power, G, alpha, 1.0 - alpha, gidx


def _fwd_kernel(starts_ref, ends_ref, pack_hbm, pixquad_ref, out_ref,
                buf, sem, acc_ref):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    a_start = (start // CHUNK) * CHUNK
    nchunks = (end - a_start + CHUNK - 1) // CHUNK

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
            _, _, alpha, om, gidx = _chunk_alpha(
                pack_c, pixquad, start, end, a_start + c * CHUNK)
            cum = _cumprod_lanes(om)
            t_after = t_vec * cum
            m = t_after >= T_EPS
            w = jnp.where(m, alpha * t_after / om, 0.0)
            acc_ref[:] += jax.lax.dot_general(
                w, pack_c[8:16, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=_f32,
                precision=jax.lax.Precision.HIGHEST)
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


def _bwd_kernel(starts_ref, ends_ref, ebase_ref, pack_hbm, pixquad_ref,
                tiles_ref, gtile_ref, gout_ref, buf, obuf, sem, osem):
    # Mosaic requires dynamic lane offsets divisible by the 128-lane
    # tiling, so loads use the same CHUNK-aligned scheme as the forward
    # kernel, and each tile's gradient chunks are stored into its own
    # CHUNK-aligned, disjoint region of an *expanded* output (per-tile
    # bases in ebase_ref, precomputed in XLA); the caller gathers the
    # per-instance gradients back from the expanded layout.
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    ebase = ebase_ref[t]
    a_start = (start // CHUNK) * CHUNK
    nchunks = jnp.where(end > start,
                        (end - a_start + CHUNK - 1) // CHUNK, 0)

    def dma_in(slot, c):
        off = pl.multiple_of(a_start + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            pack_hbm.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

    def dma_out(slot, c):
        off = pl.multiple_of(ebase + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            obuf.at[slot], gout_ref.at[:, pl.ds(off, CHUNK)], osem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    pixquad = pixquad_ref[:]
    px = pixquad[:, 3:4]
    py = pixquad[:, 4:5]
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
            power, G, alpha, om, _ = _chunk_alpha(
                pack_c, pixquad, start, end, a_start + c * CHUNK)
            cum = _cumprod_lanes(om)
            t_after = t_vec * cum
            m = t_after >= T_EPS
            t_in = t_after / om
            w = jnp.where(m, alpha * t_in, 0.0)

            # cg[p, k] = sum_ch g[p, ch] * color[ch, k]
            cg = jax.lax.dot_general(
                g8, pack_c[8:16, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=_f32,
                precision=jax.lax.Precision.HIGHEST)
            v = w * cg
            s_after = r_vec - _cumsum_lanes(v)
            active = m & (alpha > 0.0)
            dalpha = jnp.where(
                active,
                t_in * cg - (s_after + t_final * g_t) / om,
                0.0)

            op = pack_c[6:7, :]
            a = -2.0 * pack_c[0:1, :]
            cc = -2.0 * pack_c[1:2, :]
            b = -pack_c[2:3, :]
            xg = pack_c[13:14, :]
            yg = pack_c[14:15, :]
            dx = xg - px
            dy = yg - py
            gd = (op * dalpha) * G             # dL/dG * G

            def colsum(x):
                return jnp.sum(x, axis=0, keepdims=True)

            grows = jnp.concatenate([
                colsum(-gd * (a * dx + b * dy)),       # d xg
                colsum(-gd * (cc * dy + b * dx)),      # d yg
                colsum(-0.5 * gd * dx * dx),           # d conic a
                colsum(-gd * dx * dy),                 # d conic b
                colsum(-0.5 * gd * dy * dy),           # d conic c
                colsum(G * dalpha),                    # d opacity
                colsum(w * g_all[:, 0:1]),             # d color r
                colsum(w * g_all[:, 1:2]),             # d color g
                colsum(w * g_all[:, 2:3]),             # d color b
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

        @pl.when(c >= 2)
        def _():
            dma_out(slot, c - 2).wait()

        obuf[slot] = grows
        dma_out(slot, c).start()
        return (t_new, r_new)

    init = (jnp.ones((P, 1), _f32), r0)
    jax.lax.fori_loop(0, nchunks, body, init)

    @pl.when(nchunks >= 2)
    def _():
        dma_out(jax.lax.rem(nchunks - 2, 2), nchunks - 2).wait()

    @pl.when(nchunks >= 1)
    def _():
        dma_out(jax.lax.rem(nchunks - 1, 2), nchunks - 1).wait()


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    try:
        return pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:  # older/newer param spelling
        return pltpu.CompilerParams()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _composite_fwd_impl(pack, starts, ends, *, interpret: bool):
    n_tiles = starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 8), _f32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(starts, ends, pack, jnp.asarray(_pixquad()))


@functools.partial(jax.jit, static_argnames=("interpret", "m_expanded"))
def _composite_bwd_impl(pack, starts, ends, ebase, tiles, gtile, *,
                        m_expanded: int, interpret: bool):
    n_tiles = starts.shape[0]
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
            pltpu.VMEM((2, 16, CHUNK), _f32),
            pltpu.VMEM((2, 16, CHUNK), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, m_expanded), _f32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(starts, ends, ebase, pack, jnp.asarray(_pixquad()), tiles, gtile)


@jax.custom_vjp
def composite(xy_local, conic, opacity, color, depth, starts, ends):
    """Composite sorted instances into per-tile images.

    Args (M = instance capacity; per-instance arrays already gathered in
    tile-sorted order, see ops.binning):
      xy_local: [M, 2] Gaussian center in the instance's-tile-local pixel
        coordinates (xy_pixel - 16*tile_xy).
      conic: [M, 3]; opacity: [M]; color: [M, 3]; depth: [M].
      starts, ends: [n_tiles] int32 instance ranges per tile.

    Returns:
      tiles [n_tiles, 256, 8] float32; channels
      [r, g, b, depth, alpha_sum, final_T, n_contrib, pad]. Background is
      NOT applied (callers add final_T * bg, which keeps the reference's
      background gradient term, backward.cu:521-524, flowing through the
      final_T channel's cotangent). Only r/g/b/final_T are differentiable.
    """
    out, _ = _composite_fwd(xy_local, conic, opacity, color, depth,
                            starts, ends)
    return out


def _pack_padded(xy_local, conic, opacity, color, depth):
    pack = pack_instances(xy_local, conic, opacity, color, depth)
    return jnp.pad(pack, ((0, 0), (0, CHUNK)))


def _composite_fwd(xy_local, conic, opacity, color, depth, starts, ends):
    pack = _pack_padded(xy_local, conic, opacity, color, depth)
    tiles = _composite_fwd_impl(pack, starts, ends,
                                interpret=_interpret_default())
    return tiles, (pack, starts, ends, tiles)


def _composite_bwd(res, gtile):
    pack, starts, ends, tiles = res
    m = pack.shape[1] - CHUNK
    n_tiles = starts.shape[0]
    # per-tile CHUNK-aligned regions in the expanded gradient layout
    a_starts = (starts // CHUNK) * CHUNK
    nch = jnp.where(ends > starts,
                    (ends - a_starts + CHUNK - 1) // CHUNK, 0)
    sizes = nch * CHUNK
    ebase = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(sizes)[:-1].astype(jnp.int32)])
    m_expanded = pack.shape[1] + 2 * CHUNK * n_tiles   # static upper bound
    grads_e = _composite_bwd_impl(pack, starts, ends, ebase, tiles, gtile,
                                  m_expanded=m_expanded,
                                  interpret=_interpret_default())
    # map each compact instance back to its expanded column:
    # tile_of_i = #{t : ends[t] <= i} via scatter+cumsum (searchsorted is
    # ~10x slower on TPU at this size)
    i = jnp.arange(m, dtype=jnp.int32)
    bumps = jnp.zeros((m,), jnp.int32).at[ends].add(1, mode="drop")
    tile_of = jnp.cumsum(bumps)
    tile_c = jnp.minimum(tile_of, n_tiles - 1)
    eidx = ebase[tile_c] + (i - a_starts[tile_c])
    covered = i < jnp.max(ends)
    eidx = jnp.where(covered, eidx, 0)
    # transpose once, then row-gather (an axis-1 gather of 2M columns is
    # far slower on TPU than a bandwidth-bound transpose + row gather)
    grads_t = grads_e.T                               # [M_exp, 16]
    inst_g = jnp.where(covered[:, None], grads_t[eidx], 0.0)
    d_xy = inst_g[:, 0:2]
    d_conic = inst_g[:, 2:5]
    d_op = inst_g[:, 5]
    d_color = inst_g[:, 6:9]
    d_depth = jnp.zeros_like(d_op)
    zi = np.zeros(starts.shape, jax.dtypes.float0)
    return (d_xy, d_conic, d_op, d_color, d_depth, zi, zi)


composite.defvjp(_composite_fwd, _composite_bwd)
