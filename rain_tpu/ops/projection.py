"""Differentiable per-Gaussian preprocessing: projection, covariance, culling.

Pure-JAX re-derivation of the reference preprocess kernel
(cuda_rasterizer/forward.cu:63-246 and auxiliary.h:30-153). Everything here
is composed of differentiable jnp ops, so jax.grad reproduces the
reference's hand-written backward (backward.cu:133-386) — including the
FoV-clamp gradient gating (the clamp is in the forward) and the projection
chain rule — without a custom VJP.

Conventions (identical to the reference; see data/cameras.py):
- world_view: 4x4 math-convention world→view (p_view = W @ p_h).
- full_proj:  4x4 math-convention world→clip (p_hom = P @ W @ p_h).
- NDC→pixel: ((v + 1) * S - 1) / 2               (auxiliary.h:30-33)
- view-frustum cull: p_view.z <= 0.2             (auxiliary.h:143)
- EWA: cov2D = J R_wv Σ R_wvᵀ Jᵀ with the 1.3·tanfov clamp on view-space
  x/y, and `low_pass` added to the diagonal      (forward.cu:63-102)
- conic = inverse(cov2D); radius = ceil(3·sqrt(λmax)), eigenvalues through
  sqrt(max(0.1, mid²−det))                       (forward.cu:209-222)
- 16x16 pixel tiles; rect clamped to the tile grid (auxiliary.h:35-45)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rain_tpu.ops import sh as sh_ops

# TPU XLA lowers f32 matmuls to bfloat16 MXU passes by default; the
# projection/covariance products need full f32 to match the reference's
# scalar CUDA math (and the CPU path), so all matmuls here run HIGHEST.
_HI = jax.lax.Precision.HIGHEST

TILE = 16          # BLOCK_X == BLOCK_Y == 16 (config.h:4-5)
NEAR_Z = 0.2       # frustum cull threshold (auxiliary.h:143)


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""

    xy: jnp.ndarray            # [N, 2] pixel-space mean (differentiable)
    depth: jnp.ndarray         # [N]   view-space z (differentiable)
    conic: jnp.ndarray         # [N, 3] (a, b, c) of inverse 2D covariance
    rgb: jnp.ndarray           # [N, 3] SH-evaluated color (differentiable)
    opacity: jnp.ndarray       # [N]   post-sigmoid opacity (differentiable)
    radii: jnp.ndarray         # [N]   int32 screen radius, 0 = culled
    rect_min: jnp.ndarray      # [N, 2] int32 (tx0, ty0) tile rect
    rect_wh: jnp.ndarray       # [N, 2] int32 (w, h) tile rect size
    tiles_touched: jnp.ndarray  # [N] int32 = w*h (0 if culled)


def quat_scale_to_cov3d(scale: jnp.ndarray, quat: jnp.ndarray,
                        scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Σ = (S·R)ᵀ(S·R) packed as 6 uniques (forward.cu:107-141).

    Args:
      scale: [N, 3] post-activation (exp) scales.
      quat: [N, 4] (r, x, y, z) — normalized by the caller (the model's
        rotation activation), matching the reference which normalizes in
        Python before the kernel.
    Returns:
      [N, 6]: (Σ00, Σ01, Σ02, Σ11, Σ12, Σ22).
    """
    r, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    # Rotation matrix rows (forward.cu:123-127, glm column-major transposed
    # to math convention — same entries as utils/general_utils.py:52-73).
    # Σ = R S² Rᵀ expanded elementwise: batched 3x3 matmuls lower poorly
    # on TPU (MXU passes for tiny shapes); the VPU formula is ~free.
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scale_modifier * scale                     # [N, 3]
    s0, s1, s2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2
    return jnp.stack([
        s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02,
        s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12,
        s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22,
        s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12,
        s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22,
        s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22,
    ], axis=-1)


def project_cov2d(mean_view: jnp.ndarray, cov3d: jnp.ndarray,
                  world_view: jnp.ndarray, focal_x, focal_y,
                  tan_fovx, tan_fovy, low_pass) -> jnp.ndarray:
    """EWA projection of Σ to a 2D screen covariance (forward.cu:63-102).

    Args:
      mean_view: [N, 3] view-space means (pre-clamp).
      cov3d: [N, 6] packed symmetric Σ.
      world_view: [4, 4].
    Returns:
      [N, 3]: (cov_xx, cov_xy, cov_yy) with low_pass added to the diagonal.
    """
    # Guard tz for rows behind/at the camera plane: they are culled by
    # the in_front mask, but autodiff of 1/tz at tz == 0 would otherwise
    # leak NaN into their (zero-cotangent) gradients (0 * inf = NaN).
    tz = jnp.where(mean_view[:, 2] > NEAR_Z, mean_view[:, 2], 1.0)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(mean_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(mean_view[:, 1] / tz, -limy, limy) * tz

    # J rows = d(pix_unscaled)/d(view xyz) — the standard EWA Jacobian.
    # cov = (J Rwv) Σ (J Rwv)ᵀ expanded elementwise over [N] (batched tiny
    # matmuls lower poorly on TPU).
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    j00 = focal_x * inv_tz
    j02 = -(focal_x * tx) * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -(focal_y * ty) * inv_tz2

    W = world_view
    # M = J @ Rwv: rows m0, m1 of [N, 3]
    m00 = j00 * W[0, 0] + j02 * W[2, 0]
    m01 = j00 * W[0, 1] + j02 * W[2, 1]
    m02 = j00 * W[0, 2] + j02 * W[2, 2]
    m10 = j11 * W[1, 0] + j12 * W[2, 0]
    m11 = j11 * W[1, 1] + j12 * W[2, 1]
    m12 = j11 * W[1, 2] + j12 * W[2, 2]

    c = cov3d
    # v_i = Σ @ m_i
    v00 = c[:, 0] * m00 + c[:, 1] * m01 + c[:, 2] * m02
    v01 = c[:, 1] * m00 + c[:, 3] * m01 + c[:, 4] * m02
    v02 = c[:, 2] * m00 + c[:, 4] * m01 + c[:, 5] * m02
    v10 = c[:, 0] * m10 + c[:, 1] * m11 + c[:, 2] * m12
    v11 = c[:, 1] * m10 + c[:, 3] * m11 + c[:, 4] * m12
    v12 = c[:, 2] * m10 + c[:, 4] * m11 + c[:, 5] * m12

    cov00 = m00 * v00 + m01 * v01 + m02 * v02
    cov01 = m10 * v00 + m11 * v01 + m12 * v02
    cov11 = m10 * v10 + m11 * v11 + m12 * v12
    return jnp.stack([cov00 + low_pass, cov01, cov11 + low_pass], axis=-1)


def ndc_to_pix(v: jnp.ndarray, size) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5          # auxiliary.h:30-33


def preprocess(means3d: jnp.ndarray,
               scales: jnp.ndarray,
               quats: jnp.ndarray,
               opacities: jnp.ndarray,
               shs: jnp.ndarray,
               alive: jnp.ndarray,
               *,
               sh_degree: int,
               world_view: jnp.ndarray,
               full_proj: jnp.ndarray,
               camera_center: jnp.ndarray,
               tan_fovx, tan_fovy,
               width: int, height: int,
               low_pass=0.3,
               scale_modifier: float = 1.0,
               colors_override: jnp.ndarray | None = None,
               cov3d_override: jnp.ndarray | None = None,
               tile_bounds: tuple[int, int, int, int] | None = None,
               tight_opacity_culling: bool = True,
               ) -> Preprocessed:
    """Vectorized, differentiable equivalent of preprocessCUDA.

    Args:
      means3d: [N, 3]; scales: [N, 3] (post-exp); quats: [N, 4] (normalized);
      opacities: [N] (post-sigmoid); shs: [N, K, 3]; alive: [N] bool mask
        for live capacity slots (dead slots are culled).
      sh_degree: active SH degree (static).
      width/height: image size in pixels (static).
      colors_override: optional [N, 3] precomputed colors (skips SH).
      cov3d_override: optional [N, 6] precomputed 3D covariance.
      tile_bounds: optional (tx0, ty0, tx1, ty1) restriction of the tile
        grid — used by the multi-chip row-sharded path, where each shard
        only bins Gaussians against its own band of tiles. The rect is
        intersected with these bounds (and tile coordinates stay global).

    Returns: Preprocessed arrays; culled/dead entries have radii == 0 and
      tiles_touched == 0 (matching forward.cu:178-179).
    """
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    ones = jnp.ones_like(means3d[:, :1])
    p_h = jnp.concatenate([means3d, ones], axis=-1)          # [N, 4]
    p_view = jnp.matmul(p_h, world_view[:3, :].T,
                        precision=_HI)                        # [N, 3]
    p_hom = jnp.matmul(p_h, full_proj.T, precision=_HI)       # [N, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)                          # forward.cu:189
    p_proj = p_hom[:, :3] * p_w[:, None]

    in_front = p_view[:, 2] > NEAR_Z                          # auxiliary.h:143

    if cov3d_override is None:
        cov3d = quat_scale_to_cov3d(scales, quats, scale_modifier)
    else:
        cov3d = cov3d_override
    cov = project_cov2d(p_view, cov3d, world_view, focal_x, focal_y,
                        tan_fovx, tan_fovy, low_pass)

    det = cov[:, 0] * cov[:, 2] - cov[:, 1] * cov[:, 1]
    det_ok = det != 0.0                                       # forward.cu:210
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([cov[:, 2] * det_inv, -cov[:, 1] * det_inv,
                       cov[:, 0] * det_inv], axis=-1)

    mid = 0.5 * (cov[:, 0] + cov[:, 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))              # forward.cu:222

    xy = jnp.stack([ndc_to_pix(p_proj[:, 0], width),
                    ndc_to_pix(p_proj[:, 1], height)], axis=-1)

    # Tile rect (auxiliary.h:35-45). Clamp handles the C trunc-vs-floor
    # division difference (both land at the clamp for negatives).
    if tile_bounds is None:
        bx0, by0, bx1, by1 = 0, 0, grid_x, grid_y
    else:
        bx0, by0, bx1, by1 = tile_bounds

    def make_rect(radius_x, radius_y):
        rx0 = jnp.clip(jnp.floor((xy[:, 0] - radius_x) / TILE), bx0, bx1)
        ry0 = jnp.clip(jnp.floor((xy[:, 1] - radius_y) / TILE), by0, by1)
        rx1 = jnp.clip(jnp.floor((xy[:, 0] + radius_x + TILE - 1) / TILE),
                       bx0, bx1)
        ry1 = jnp.clip(jnp.floor((xy[:, 1] + radius_y + TILE - 1) / TILE),
                       by0, by1)
        return (rx0, ry0, (rx1 - rx0).astype(jnp.int32),
                (ry1 - ry0).astype(jnp.int32))

    _, _, ref_w, ref_h = make_rect(radius_f, radius_f)
    has_area = (ref_w * ref_h) > 0                            # forward.cu:226
    visible = alive & in_front & det_ok & has_area
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    if tight_opacity_culling:
        # Output-exact tile culling (beyond the reference, which bins the
        # bbox of a 3σ *circle* of radius 3·sqrt(λmax), forward.cu:219-225):
        # a pixel passes the compositor's alpha >= 1/255 test
        # (forward.cu:336-338) only if its Mahalanobis form q satisfies
        # op*exp(-q/2) >= 1/255, i.e. q <= lim = 2*ln(255*op). The set
        # {q <= lim} is an ellipse whose exact axis-aligned extents are
        # sqrt(lim·cov00 / cov11); taking the per-axis min with the
        # reference circle radius keeps the rect inside the reference
        # bbox, and every pixel dropped is skipped by the reference loop
        # anyway (alpha < 1/255, or outside its own rect), so image,
        # transmittance, and all gradients are unchanged; only the
        # n_contrib bookkeeping differs. Anisotropic splats and
        # low-opacity splats (post-reset) shed most of their tiles.
        # The +slack/+1px absorb fp rounding of the kernel's
        # quadratic-expansion power (abs error ~1e-4) so borderline-alpha
        # pixels stay inside. Reported radii keep the reference 3σ
        # formula (they feed size pruning, gaussian_model.py:412).
        # Caveat: pixels whose transmittance sits exactly at the 1e-4
        # termination cutoff can flip their stopping point whenever fp
        # grouping changes (instance-list length moves chunk
        # boundaries); the resulting difference is bounded by that
        # residual transmittance (<~1e-3) and applies equally to any
        # reimplementation of the CUDA loop.
        lim = jnp.maximum(
            2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-6)) + 0.02,
            0.0)
        r_x = jnp.minimum(radius_f,
                          jnp.ceil(jnp.sqrt(lim * cov[:, 0])) + 1.0)
        r_y = jnp.minimum(radius_f,
                          jnp.ceil(jnp.sqrt(lim * cov[:, 2])) + 1.0)
        reachable = opacities >= (1.0 / 255.0)
    else:
        r_x = r_y = radius_f
        reachable = True

    rx0, ry0, rect_w, rect_h = make_rect(r_x, r_y)
    tiles_touched = jnp.where(visible & reachable, rect_w * rect_h,
                              0).astype(jnp.int32)

    if colors_override is None:
        rgb = sh_ops.sh_to_rgb(sh_degree, shs, means3d, camera_center)
    else:
        rgb = colors_override

    return Preprocessed(
        xy=xy,
        depth=p_view[:, 2],
        conic=conic,
        rgb=rgb,
        opacity=opacities,
        radii=radii,
        rect_min=jnp.stack([rx0, ry0], axis=-1).astype(jnp.int32),
        rect_wh=jnp.stack([rect_w, rect_h], axis=-1),
        tiles_touched=tiles_touched,
    )
