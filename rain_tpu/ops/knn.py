"""Mean squared distance to the 3 nearest neighbors (scale initialization).

TPU-native equivalent of the simple-knn CUDA extension
(submodules/simple-knn/simple_knn.cu:174-210), used once at model init
(reference scene/gaussian_model.py:124) to size each Gaussian by its local
point density. The CUDA version Morton-sorts points, then scans a ±3
window along the curve and sweeps AABB boxes of 1024 points with a
rejection radius.

Here: Morton-sort with XLA (30-bit codes, identical bit interleave,
simple_knn.cu:34-59), then an exact windowed candidate search along the
curve — every point considers its W nearest neighbors *along the Morton
curve* on each side. With W large enough this matches the CUDA output on
real point sets closely (the CUDA box sweep is itself exact); the windowed
pass is fully vectorized (a [N, 2W] gather + top-3 selection) and runs at
memory bandwidth. W is configurable; `exact` mode does the O(N²) scan in
row blocks for small N (used in tests to validate the windowed result).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _expand_bits(x):
    """Spread 10 bits to every 3rd bit (simple_knn.cu:34-41)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes over the bounding box (simple_knn.cu:43-59)."""
    mn = jnp.min(points, axis=0)
    mx = jnp.max(points, axis=0)
    scale = (mx - mn)
    scale = jnp.where(scale > 0, scale, 1.0)
    q = ((points - mn) / scale * ((1 << 10) - 1)).astype(jnp.uint32)
    return (_expand_bits(q[:, 0]) | (_expand_bits(q[:, 1]) << 1) |
            (_expand_bits(q[:, 2]) << 2))


@functools.partial(jax.jit, static_argnames=("window",))
def mean_dist3(points: jnp.ndarray, window: int = 64) -> jnp.ndarray:
    """Mean squared distance to each point's 3 nearest neighbors.

    Args:
      points: [N, 3] float32.
      window: candidates per side along the Morton curve.

    Returns:
      [N] float32 — same quantity as reference distCUDA2.
    """
    n = points.shape[0]
    codes = morton_codes(points)
    order = jnp.argsort(codes)
    pts = points[order]                                    # [N, 3]

    offsets = jnp.concatenate([
        jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    idx = jnp.arange(n)[:, None] + offsets[None, :]        # [N, 2W]
    valid = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)
    cand = pts[idx]                                        # [N, 2W, 3]
    d2 = jnp.sum((cand - pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    top3 = -jax.lax.top_k(-d2, 3)[0]                       # [N, 3] smallest
    mean3 = jnp.where(jnp.isfinite(top3), top3, 0.0).mean(axis=1)

    out = jnp.zeros((n,), points.dtype).at[order].set(mean3)
    return out


def mean_dist3_exact(points: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """O(N²) exact reference (for tests / tiny N)."""
    n = points.shape[0]
    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e10)

    def body(i, acc):
        return jax.lax.dynamic_update_slice(
            acc, row_block_p(i * block), (i * block,))

    def row_block_p(i0):
        p = jax.lax.dynamic_slice(pts, (i0, 0), (block, 3))
        d2 = jnp.sum((p[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        rows = i0 + jnp.arange(block)
        d2 = jnp.where(rows[:, None] == jnp.arange(n)[None, :], jnp.inf, d2)
        top3 = -jax.lax.top_k(-d2, 3)[0]
        return top3.mean(axis=1)

    acc = jnp.zeros((nblocks * block,), points.dtype)
    acc = jax.lax.fori_loop(0, nblocks, body, acc)
    return acc[:n]
