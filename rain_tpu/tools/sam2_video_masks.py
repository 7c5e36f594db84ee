"""SAM2 part-mask extraction over a frame sequence.

Port of reference sam2-scripts/sub_video_sam.py (:122-233): automatic mask
generation on the first frame, each auto-mask registered as a tracked
object, masks propagated through the video, per-frame binary masks saved
as <out>/frame_NNNN/mask_MM.png plus an overview image and an mp4.

The reference hard-codes paths and SAM2 checkpoints; this version takes
them as flags. Requires the external `sam2` package + torch GPU/CPU
(facebookresearch/sam2 — a git submodule stub in the reference); exits
with a clear message when unavailable.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_path", required=True,
                   help="directory of frames named NNN.jpg/png")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="sam2 checkpoint .pt")
    p.add_argument("--model_cfg", default="sam2_hiera_l.yaml")
    p.add_argument("--min_area", type=int, default=500)
    p.add_argument("--device", default="cuda")
    args = p.parse_args(argv)

    try:
        import torch
        from sam2.automatic_mask_generator import SAM2AutomaticMaskGenerator
        from sam2.build_sam import build_sam2, build_sam2_video_predictor
    except ImportError as e:
        sys.exit(f"sam2 is not installed ({e}); install "
                 "facebookresearch/sam2 to use this tool")
    from PIL import Image

    frames = sorted(
        [f for f in os.listdir(args.video_path)
         if f.lower().endswith((".jpg", ".jpeg", ".png"))],
        key=lambda q: int(os.path.splitext(q)[0]))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # auto-mask the first frame (sub_video_sam.py:122-150)
    sam2 = build_sam2(args.model_cfg, args.checkpoint, device=args.device,
                      apply_postprocessing=False)
    first = np.array(Image.open(
        Path(args.video_path) / frames[0]).convert("RGB"))
    gen = SAM2AutomaticMaskGenerator(
        model=sam2, points_per_side=64, points_per_batch=128,
        pred_iou_thresh=0.7, stability_score_thresh=0.92,
        stability_score_offset=0.7, crop_n_layers=1, box_nms_thresh=0.7,
        crop_n_points_downscale_factor=2,
        min_mask_region_area=args.min_area, use_m2m=True)
    auto_masks = gen.generate(first)
    print(f"Number of auto-masks: {len(auto_masks)}")

    # masks → video-tracking prompts (sub_video_sam.py:153-174)
    predictor = build_sam2_video_predictor(args.model_cfg, args.checkpoint,
                                           device=args.device)
    state = predictor.init_state(video_path=args.video_path)
    dtype = next(predictor.parameters()).dtype
    lowres = predictor.image_size // 4
    for idx, m in enumerate(auto_masks):
        t = torch.tensor(m["segmentation"], dtype=dtype,
                         device=args.device)
        lm = torch.nn.functional.interpolate(
            t[None, None], size=(lowres, lowres), mode="bilinear",
            align_corners=False).squeeze()
        predictor.add_new_mask(inference_state=state, frame_idx=0,
                               obj_id=idx, mask=lm)

    # propagate (sub_video_sam.py:177-186)
    segments = {}
    for fidx, obj_ids, logits in predictor.propagate_in_video(state):
        segments[fidx] = {
            oid: (logits[i] > 0.0).cpu().numpy()
            for i, oid in enumerate(obj_ids)}

    # save per-frame binary masks + overview (sub_video_sam.py:188-205)
    overview_paths = []
    for fidx in range(len(segments)):
        fdir = out / f"frame_{fidx:04d}"
        fdir.mkdir(exist_ok=True)
        overlay = None
        for oid, mask in segments[fidx].items():
            binary = (mask > 0).astype(np.uint8) * 255
            Image.fromarray(binary[0], mode="L").save(
                fdir / f"mask_{oid:02d}.png")
            color = np.array([(oid * 67) % 255, (oid * 131) % 255,
                              (oid * 197) % 255], np.uint8)
            if overlay is None:
                overlay = np.zeros(binary[0].shape + (3,), np.uint8)
            overlay[binary[0] > 0] = color
        if overlay is not None:
            path = fdir / "all.jpg"
            Image.fromarray(overlay).save(path)
            overview_paths.append(path)

    _write_mp4(out, overview_paths)


def _write_mp4(out: Path, frame_paths, fps: int = 30):
    """Overview video (sub_video_sam.py:208-233); gated on cv2."""
    if not frame_paths:
        return
    try:
        import cv2
    except ImportError:
        print("cv2 not available; skipping mp4")
        return
    first = cv2.imread(str(frame_paths[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(str(out / f"{out.name}.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frame_paths:
        vw.write(cv2.imread(str(f)))
    vw.release()
    print(f"Video saved to {out / (out.name + '.mp4')}")


if __name__ == "__main__":
    main()
