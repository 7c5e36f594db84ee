"""rain-tpu: a TPU-native 3D Gaussian Splatting training framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
CUDA codebase (sharonal10/rain — an INRIA 3DGS fork with RAIN-GS random
initialization; see SURVEY.md): a fully differentiable splat rasterizer,
on-device densification, COLMAP/Blender loading, PLY interchange, and
PSNR/SSIM/LPIPS evaluation — plus pod-scale sharding the reference lacks.

Architecture (TPU-first, not a port):
  ops/       — differentiable projection/SH preprocess (pure XLA autodiff),
               int-only tile binning (stable sorts + searchsorted expansion),
               Pallas tile compositor fwd/bwd wrapped in jax.custom_vjp,
               KNN init, losses.
  model/     — GaussianScene pytree with static capacity + alive count,
               custom per-group Adam, masked densify/clone/split/prune.
  data/      — COLMAP binary/text parser, Blender transforms, PLY IO,
               camera math, scene assembly + init-point policies.
  train/     — schedules (expon LR, c2f low-pass, SH degree), the jitted
               train step, the Trainer driver, checkpointing.
  parallel/  — mesh construction and the shard_map multi-chip train step
               (ZeRO-style Gaussian-sharded preprocess/optimizer +
               tile-row-sharded rasterization with reduce-scattered
               gradients), multi-host bring-up via jax.distributed.
  eval/      — PSNR/SSIM/LPIPS metrics and eval loops.
"""

__version__ = "0.1.0"
