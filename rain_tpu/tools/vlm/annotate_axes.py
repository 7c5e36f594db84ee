"""Overlay axis/angle annotations onto images (cf. reference vlm/annotate_axes.py).

Pure-PIL, no API calls: centered x/y axes with signed-direction labels,
angle labels every 90 degrees starting at 45, and two red diagonals.
The overlay is described declaratively (line segments + text anchors)
and rasterized in one pass.
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".gif")


def _overlay_spec(w: int, h: int):
    """Declarative overlay: (lines, labels) in pixel coordinates.

    Lines are (start, end, color); labels are (anchor, string). Angle
    anchors sit on a circle of radius min(w,h)/4 around the center, with
    screen-y flipped (math convention: angles increase counter-clockwise).
    """
    cx, cy = w // 2, h // 2
    lines = [
        ((0, cy), (w, cy), "black"),          # x-axis
        ((cx, 0), (cx, h), "black"),          # y-axis
        ((0, 0), (w, h), "red"),              # main diagonal
        ((w, 0), (0, h), "red"),              # anti-diagonal
    ]
    labels = [
        ((w - 30, cy + 10), "x"),
        ((cx + 10, 20), "y"),
        ((w - 30, cy - 30), "+x"),
        ((20, 20), "-y"),
        ((20, h - 40), "-x"),
        ((cx + 10, h - 40), "+y"),
    ]
    r = min(w, h) // 4
    for deg in range(45, 360, 90):
        theta = math.radians(deg)
        anchor = (cx + round(r * math.cos(theta)),
                  cy - round(r * math.sin(theta)))
        labels.append((anchor, f"{deg}\N{DEGREE SIGN}"))
    return lines, labels


def annotate(image_path, output_path) -> None:
    from PIL import Image, ImageDraw, ImageFont

    src = Image.open(image_path)
    canvas = Image.new("RGB", src.size, "white")
    canvas.paste(src, (0, 0))

    lines, labels = _overlay_spec(*src.size)
    pen = ImageDraw.Draw(canvas)
    for start, end, color in lines:
        pen.line([start, end], fill=color, width=2)
    try:
        font = ImageFont.load_default()
    except Exception:
        font = None
    for anchor, s in labels:
        pen.text(anchor, s, fill="black", font=font)
    canvas.save(output_path)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_folder", required=True)
    p.add_argument("--output_folder", required=True)
    args = p.parse_args(argv)

    src_dir, out_dir = Path(args.input_folder), Path(args.output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    for entry in sorted(src_dir.iterdir()):
        if entry.suffix.lower() in EXTS:
            annotate(entry, out_dir / entry.name)
            print(f"Processed: {entry.name}")
    print("All images processed successfully.")


if __name__ == "__main__":
    main()
