"""Draw axis/angle annotations onto images (reference vlm/annotate_axes.py).

Pure-PIL, no API: x/y axes through the center with +/- labels, 45°-step
angle labels on a circle, and red diagonals.
"""

from __future__ import annotations

import argparse
import math
import os
from pathlib import Path

EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".gif")


def annotate(image_path, output_path):
    from PIL import Image, ImageDraw, ImageFont
    img = Image.open(image_path)
    width, height = img.size
    new_img = Image.new("RGB", (width, height), color="white")
    new_img.paste(img, (0, 0))
    draw = ImageDraw.Draw(new_img)
    draw.line([(0, height // 2), (width, height // 2)], fill="black",
              width=2)
    draw.line([(width // 2, 0), (width // 2, height)], fill="black",
              width=2)
    try:
        font = ImageFont.load_default()
    except Exception:
        font = None

    def text(pos, s):
        draw.text(pos, s, fill="black", font=font)

    text((width - 30, height // 2 + 10), "x")
    text((width // 2 + 10, 20), "y")
    text((width - 30, height // 2 - 30), "+x")
    text((20, 20), "-y")
    text((20, height - 40), "-x")
    text((width // 2 + 10, height - 40), "+y")
    radius = min(width, height) // 4
    for angle in (45, 135, 225, 315):
        x = width // 2 + int(radius * math.cos(math.radians(angle)))
        y = height // 2 - int(radius * math.sin(math.radians(angle)))
        text((x, y), f"{angle}°")
    draw.line([(0, 0), (width, height)], fill="red", width=2)
    draw.line([(width, 0), (0, height)], fill="red", width=2)
    new_img.save(output_path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_folder", required=True)
    p.add_argument("--output_folder", required=True)
    args = p.parse_args(argv)

    out = Path(args.output_folder)
    out.mkdir(parents=True, exist_ok=True)
    for name in os.listdir(args.input_folder):
        if name.lower().endswith(EXTS):
            annotate(os.path.join(args.input_folder, name), out / name)
            print(f"Processed: {name}")
    print("All images processed successfully.")


if __name__ == "__main__":
    main()
