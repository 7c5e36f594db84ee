"""LPIPS perceptual metric: VGG16 feature distance with linear heads.

Counterpart of the reference lpipsPyTorch/ package (modules/lpips.py,
modules/networks.py:62-96): normalized VGG16 conv features at the 5 relu
block outputs, channel-normalized, squared difference, 1x1 linear heads,
spatial mean, summed over layers.

Weights: the reference downloads torchvision VGG16 + LPIPS linear weights
from GitHub at runtime (modules/utils.py:11-28). This environment has no
egress, so weights are loaded from local files when present and the metric
is cleanly unavailable otherwise:
  $RAIN_TPU_LPIPS_VGG    — torchvision vgg16 state_dict (.pth)
  $RAIN_TPU_LPIPS_LIN    — LPIPS 'vgg' linear weights state_dict (.pth)
"""

from __future__ import annotations

import functools
import os

import numpy as np

VGG_SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))
# torchvision vgg16.features conv layer indices
VGG_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_torch_state(path):
    import torch
    return {k: np.asarray(v.cpu().numpy()) for k, v in
            torch.load(path, map_location="cpu", weights_only=True).items()}


@functools.lru_cache()
def _load_weights():
    vgg_path = os.environ.get("RAIN_TPU_LPIPS_VGG")
    lin_path = os.environ.get("RAIN_TPU_LPIPS_LIN")
    if not vgg_path or not os.path.exists(vgg_path):
        return None
    vgg = _load_torch_state(vgg_path)
    convs = [(vgg[f"features.{i}.weight"], vgg[f"features.{i}.bias"])
             for i in VGG_CONV_IDX]
    lins = None
    if lin_path and os.path.exists(lin_path):
        lin = _load_torch_state(lin_path)
        lins = [lin[k] for k in sorted(lin.keys())
                if k.endswith("weight")]
    return convs, lins


def lpips_fn_or_none(log_fn=None):
    """Returns lpips(img1, img2) over [3,H,W] in [0,1], or None if
    weights are unavailable. When None and ``log_fn`` is given, emits a
    one-line warning (once per process) so the LPIPS key silently
    missing from results.json / reports is explained — the reference
    always has the metric because it downloads weights at runtime
    (lpipsPyTorch/modules/utils.py:11-28)."""
    weights = _load_weights()
    if weights is None:
        if log_fn is not None and not _load_weights.warned:
            _load_weights.warned = True
            log_fn("[lpips] VGG weights unavailable (set "
                   "RAIN_TPU_LPIPS_VGG / RAIN_TPU_LPIPS_LIN) — LPIPS "
                   "will be omitted from reports and results.json")
        return None
    convs, lins = weights
    return make_lpips(convs, lins)


_load_weights.warned = False


def make_lpips(convs, lins):
    """Build lpips(img1, img2) from explicit weights.

    convs: 13 (weight [O,I,3,3], bias [O]) pairs for torchvision
      vgg16.features conv layers; lins: 5 [1,C,1,1] linear-head weights
      (or None → channel mean). Inputs are [3,H,W]; the reference feeds
      its [0,1] tensors straight into the z-score normalization
      (lpipsPyTorch/modules/networks.py BaseNet.forward — no [-1,1]
      rescale), so we do the same.
    """
    import jax
    import jax.numpy as jnp

    conv_params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in convs]
    lin_params = [jnp.asarray(w) for w in lins] if lins else None

    @jax.jit
    def lpips(img1, img2):
        def features(img):
            # z_score (networks.py:49-50): applied to the caller's [0,1]
            # image directly, matching the reference call sites
            # (train.py:198, metrics.py:70)
            x = (img - SHIFT[:, None, None]) / SCALE[:, None, None]
            x = x[None]
            feats = []
            ci = 0
            layer = 0
            for lo, hi in VGG_SLICES:
                while layer < hi:
                    if layer in VGG_CONV_IDX:
                        w, b = conv_params[ci]
                        x = jax.lax.conv_general_dilated(
                            x, jnp.asarray(w), (1, 1),
                            [(1, 1), (1, 1)],
                            dimension_numbers=("NCHW", "OIHW", "NCHW"))
                        x = x + jnp.asarray(b)[None, :, None, None]
                        x = jax.nn.relu(x)
                        ci += 1
                    elif layer in (4, 9, 16, 23):
                        x = jax.lax.reduce_window(
                            x, -jnp.inf, jax.lax.max,
                            (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
                    layer += 1
                feats.append(x)
            return feats

        f1 = features(img1)
        f2 = features(img2)
        total = 0.0
        for li, (a, b) in enumerate(zip(f1, f2)):
            a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            if lin_params is not None:
                w = lin_params[li][:, :, 0, 0]          # [1, C]
                d = jnp.einsum("nchw,oc->nohw", d, w)
            else:
                d = d.mean(axis=1, keepdims=True)
            total = total + d.mean()
        return total

    return lpips
