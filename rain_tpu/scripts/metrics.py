"""Metrics CLI — counterpart of reference metrics.py:27-84.

Walks <model_path>/test/ours_<iter>/{renders,gt}, computes SSIM/PSNR (and
LPIPS when weights are available), writes results.json and per_view.json.

Usage: python -m rain_tpu.scripts.metrics -m <model_path> [...]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _load_dir(d: Path):
    from PIL import Image
    images, names = [], []
    for p in sorted(d.iterdir()):
        arr = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        images.append(arr.transpose(2, 0, 1))
        names.append(p.name)
    return images, names


def evaluate(model_paths):
    import jax.numpy as jnp
    from rain_tpu.eval.lpips import lpips_fn_or_none
    from rain_tpu.ops import losses

    lpips_fn = lpips_fn_or_none(log_fn=print)
    full, per_view = {}, {}
    for model_path in model_paths:
        model_path = Path(model_path)
        print(f"Scene: {model_path}")
        full[str(model_path)] = {}
        per_view[str(model_path)] = {}
        test_dir = model_path / "test"
        for method_dir in sorted(test_dir.iterdir()):
            renders, names = _load_dir(method_dir / "renders")
            gts, _ = _load_dir(method_dir / "gt")
            ssims, psnrs, lpipss = [], [], []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r), jnp.asarray(g)
                ssims.append(float(losses.ssim(rj, gj)))
                psnrs.append(float(losses.psnr(rj, gj)[0]))
                if lpips_fn is not None:
                    lpipss.append(float(lpips_fn(rj, gj)))
            entry = {"SSIM": float(np.mean(ssims)),
                     "PSNR": float(np.mean(psnrs))}
            pv = {"SSIM": dict(zip(names, map(float, ssims))),
                  "PSNR": dict(zip(names, map(float, psnrs)))}
            if lpipss:
                entry["LPIPS"] = float(np.mean(lpipss))
                pv["LPIPS"] = dict(zip(names, map(float, lpipss)))
            full[str(model_path)][method_dir.name] = entry
            per_view[str(model_path)][method_dir.name] = pv
            print(f"  {method_dir.name}: SSIM {entry['SSIM']:.7f} "
                  f"PSNR {entry['PSNR']:.7f} "
                  f"LPIPS {entry.get('LPIPS', float('nan')):.7f}")
        (model_path / "results.json").write_text(
            json.dumps(full[str(model_path)], indent=True))
        (model_path / "per_view.json").write_text(
            json.dumps(per_view[str(model_path)], indent=True))
    return full


def main(argv=None):
    parser = argparse.ArgumentParser(description="rain-tpu metrics")
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = parser.parse_args(argv)
    evaluate(args.model_paths)


if __name__ == "__main__":
    main()
