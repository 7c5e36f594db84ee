"""Composite colored part-mask overlays onto base renders.

Port of reference combine_masks.py (:27-57): for each frame directory of
binary part masks, alpha-blend a fixed color per part onto the base image
and stamp the frame name. Paths are flags here instead of hard-coded
constants; text stamping uses PIL (cv2-free).

  python -m rain_tpu.tools.combine_masks --masks masks/ \\
      --base renders/ --out overlays/
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

DEFAULT_COLORS = {
    "000.png": (255, 0, 0),
    "001.png": (0, 255, 0),
    "002.png": (0, 0, 255),
    "003.png": (255, 255, 0),
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--masks", required=True,
                   help="dir of per-frame subdirs of binary masks")
    p.add_argument("--base", required=True,
                   help="dir of base images named <frame>.png")
    p.add_argument("--out", required=True)
    p.add_argument("--alpha", type=float, default=0.5)
    args = p.parse_args(argv)

    from PIL import Image, ImageDraw

    frame_dirs = sorted(d for d in os.listdir(args.masks)
                        if os.path.isdir(os.path.join(args.masks, d)))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for frame in frame_dirs:
        base = np.array(Image.open(
            Path(args.base) / f"{frame}.png").convert("RGB"), np.float32)
        final = base.copy()
        for mask_name, color in DEFAULT_COLORS.items():
            mp = Path(args.masks) / frame / mask_name
            if not mp.exists():
                continue
            mask = np.array(Image.open(mp).convert("L"), np.float32)
            if not (mask > 0).any():
                continue
            color_img = (mask[..., None] / 255.0) * np.array(color,
                                                             np.float32)
            a = (mask / 255.0 * args.alpha)[..., None]
            final = (1 - a) * final + a * color_img
        img = Image.fromarray(np.clip(final, 0, 255).astype(np.uint8))
        draw = ImageDraw.Draw(img)
        tw = draw.textlength(frame)
        draw.text((img.width - tw - 10, 10), frame, fill=(255, 0, 0))
        img.save(out / f"{frame}.png")
    print(f"wrote {len(frame_dirs)} overlays to {out}")


if __name__ == "__main__":
    main()
