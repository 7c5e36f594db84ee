"""Oracle compositor: sequential, pure-JAX replica of the CUDA render loop.

This is the test oracle (and the CPU-runnable tiny-scene path): it replays
the reference's front-to-back per-pixel compositing semantics
(cuda_rasterizer/forward.cu:251-369) one Gaussian at a time with lax.scan,
including every skip/termination rule:

- a Gaussian contributes to a pixel only if the pixel's 16x16 tile lies in
  the Gaussian's projected rect (tile-list membership, forward.cu:225-227
  + duplicateWithKeys), not merely if its alpha is large;
- power > 0 → skip (forward.cu:329-330);
- alpha = min(0.99, opacity * exp(power)); alpha < 1/255 → skip
  (forward.cu:336-338) — the 0.99 clamp passes gradient through, exactly
  like the reference backward (backward.cu:489,528 applies no clamp gate);
- test_T = T*(1-alpha) < 1e-4 → terminate the pixel BEFORE compositing
  (forward.cu:339-344);
- output color = C + T_final * bg; depth is the alpha-weighted
  (unnormalized) sum; the depth output carries no gradient (the reference
  autograd glue ignores grad_depth, dgr/__init__.py:96).

Gaussians are traversed in (depth, index) stable order — identical to the
binning order of both the CUDA tile lists and our production kernel.
Being pure jnp, jax.grad of this function reproduces the reference's
hand-written backward (backward.cu:389-547) up to float ordering.

O(N * H * W): use only for tests and small scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rain_tpu.ops.projection import TILE, Preprocessed

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_CLAMP = 0.99


def _passthrough_min(x, cap):
    """min(x, cap) in value, identity in gradient (reference backward.cu:528)."""
    return x + jax.lax.stop_gradient(jnp.minimum(x, cap) - x)


def composite_reference(prep: Preprocessed, width: int, height: int,
                        bg: jnp.ndarray):
    """Composite all Gaussians over the full image, sequentially.

    Args:
      prep: Preprocessed per-Gaussian arrays (capacity N; culled entries
        have tiles_touched == 0).
      bg: [3] background color.

    Returns:
      dict with render [3,H,W], depth [1,H,W] (no gradient), final_T [H,W],
      n_contrib [H,W] (int32, 1-based index of last composited Gaussian in
      the pixel's tile list — matches CUDA n_contrib).
    """
    n = prep.depth.shape[0]
    visible = prep.tiles_touched > 0
    depth_key = jnp.where(visible, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)

    px = jnp.arange(width, dtype=jnp.float32)[None, :]    # [1,W]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]   # [H,1]
    tile_x = (jnp.arange(width) // TILE)[None, :]
    tile_y = (jnp.arange(height) // TILE)[:, None]

    def step(carry, g):
        T, C, D, done, cnt, last = carry
        member = (visible[g]
                  & (tile_x >= prep.rect_min[g, 0])
                  & (tile_x < prep.rect_min[g, 0] + prep.rect_wh[g, 0])
                  & (tile_y >= prep.rect_min[g, 1])
                  & (tile_y < prep.rect_min[g, 1] + prep.rect_wh[g, 1]))
        cnt = cnt + member.astype(jnp.int32)
        dx = prep.xy[g, 0] - px
        dy = prep.xy[g, 1] - py
        a, b, c = prep.conic[g, 0], prep.conic[g, 1], prep.conic[g, 2]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = _passthrough_min(prep.opacity[g] * jnp.exp(power), ALPHA_CLAMP)
        ok = member & ~done & (power <= 0.0) & (alpha >= ALPHA_MIN)
        test_t = T * (1.0 - alpha)
        live = jax.lax.stop_gradient(ok & (test_t >= T_EPS))
        w = jnp.where(live, alpha * T, 0.0)
        C = C + w[None] * prep.rgb[g][:, None, None]
        D = D + jax.lax.stop_gradient(w) * prep.depth[g]
        T = jnp.where(live, test_t, T)
        # Permanent termination once test_t < T_EPS fires for a Gaussian
        # that passed the alpha checks; T itself stays at its pre-
        # termination value (forward.cu:339-344 does `continue` without
        # updating T, and final_T is written from that T).
        done = done | (ok & (test_t < T_EPS))
        last = jnp.where(live, cnt, last)
        return (T, C, D, done, cnt, last), None

    dt = prep.depth.dtype
    T0 = jnp.ones((height, width), dt)
    C0 = jnp.zeros((3, height, width), dt)
    D0 = jnp.zeros((height, width), dt)
    done0 = jnp.zeros((height, width), bool)
    cnt0 = jnp.zeros((height, width), jnp.int32)
    (T, C, D, _, _, last), _ = jax.lax.scan(
        step, (T0, C0, D0, done0, cnt0, cnt0), order)
    render = C + T[None] * bg[:, None, None]
    return {
        "render": render,
        "depth": D[None],
        "final_T": T,
        "n_contrib": last,
    }
