"""LPIPS parity: the JAX VGG16-LPIPS graph vs a direct torch
transcription of the reference network semantics
(lpipsPyTorch/modules/networks.py:62-96, modules/lpips.py), with random
weights (no egress for the pretrained ones — the graph is what's under
test; weights are data)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rain_tpu.eval import lpips as lpips_mod


# torchvision vgg16.features channel plan per conv layer index
_VGG_PLAN = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
             10: (128, 256), 12: (256, 256), 14: (256, 256),
             17: (256, 512), 19: (512, 512), 21: (512, 512),
             24: (512, 512), 26: (512, 512), 28: (512, 512)}
_LIN_CHANNELS = (64, 128, 256, 512, 512)


def _random_weights(seed=0):
    rng = np.random.default_rng(seed)
    convs = []
    for idx in lpips_mod.VGG_CONV_IDX:
        cin, cout = _VGG_PLAN[idx]
        w = rng.normal(0, 0.5 / np.sqrt(cin * 9),
                       (cout, cin, 3, 3)).astype(np.float32)
        b = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        convs.append((w, b))
    lins = [np.abs(rng.normal(0, 1.0, (1, c, 1, 1))).astype(np.float32)
            for c in _LIN_CHANNELS]
    return convs, lins


def _torch_lpips(convs, lins, img1, img2):
    """Direct transcription of the reference forward: z_score on the
    [0,1] input (networks.py:49-50 — no [-1,1] rescale), VGG16 features
    at layers {4,9,16,23,30} (1-based enumeration → after each block's
    last ReLU), channel-normalized, squared diff, 1x1 lin heads, spatial
    mean, summed over layers (lpips.py:25-30)."""
    import torch.nn.functional as F

    mean = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    std = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def features(x):
        x = (x[None] - mean) / std
        out = []
        ci = 0
        for layer in range(30):
            if layer in lpips_mod.VGG_CONV_IDX:
                w, b = convs[ci]
                x = F.relu(F.conv2d(x, torch.from_numpy(w),
                                    torch.from_numpy(b), padding=1))
                ci += 1
            elif layer in (4, 9, 16, 23):
                x = F.max_pool2d(x, 2, 2)
            if layer in (3, 8, 15, 22, 29):
                n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                out.append(x / (n + 1e-10))
        return out

    f1 = features(torch.from_numpy(img1))
    f2 = features(torch.from_numpy(img2))
    total = 0.0
    for (a, b), lin in zip(zip(f1, f2), lins):
        d = (a - b) ** 2
        r = F.conv2d(d, torch.from_numpy(lin))
        total = total + r.mean(dim=(2, 3))
    return float(total.sum())


@pytest.mark.parametrize("with_lins", [True, False])
def test_lpips_matches_torch_transcription(with_lins):
    convs, lins = _random_weights()
    rng = np.random.default_rng(1)
    img1 = rng.uniform(0, 1, (3, 40, 48)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0,
                   1).astype(np.float32)

    fn = lpips_mod.make_lpips(convs, lins if with_lins else None)
    got = float(fn(img1, img2))

    if with_lins:
        want = _torch_lpips(convs, lins, img1, img2)
    else:
        # channel-mean fallback == lin head with weight 1/C
        mean_lins = [np.full((1, c, 1, 1), 1.0 / c, np.float32)
                     for c in _LIN_CHANNELS]
        want = _torch_lpips(convs, mean_lins, img1, img2)
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)
    # sanity: identical images → 0
    assert float(fn(img1, img1)) < 1e-6


def test_metrics_cli_with_lpips_weights(tmp_path, monkeypatch):
    """scripts.metrics picks up LPIPS weights from the env and reports a
    finite number (reference metrics.py:62-74 protocol)."""
    convs, lins = _random_weights()
    vgg_sd = {}
    for idx, (w, b) in zip(lpips_mod.VGG_CONV_IDX, convs):
        vgg_sd[f"features.{idx}.weight"] = torch.from_numpy(w)
        vgg_sd[f"features.{idx}.bias"] = torch.from_numpy(b)
    lin_sd = {f"{i}.1.weight": torch.from_numpy(l)
              for i, l in enumerate(lins)}
    vgg_path = tmp_path / "vgg.pth"
    lin_path = tmp_path / "lin.pth"
    torch.save(vgg_sd, vgg_path)
    torch.save(lin_sd, lin_path)
    monkeypatch.setenv("RAIN_TPU_LPIPS_VGG", str(vgg_path))
    monkeypatch.setenv("RAIN_TPU_LPIPS_LIN", str(lin_path))
    lpips_mod._load_weights.cache_clear()
    try:
        fn = lpips_mod.lpips_fn_or_none()
        assert fn is not None
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        b = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        v = float(fn(a, b))
        assert np.isfinite(v) and v > 0
        # parity with the torch transcription through the env-loaded path
        want = _torch_lpips(convs, lins, a, b)
        assert abs(v - want) < 1e-4 * max(1.0, abs(want))
    finally:
        lpips_mod._load_weights.cache_clear()
