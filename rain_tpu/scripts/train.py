"""Training CLI — counterpart of reference train.py:226-296.

Usage: python -m rain_tpu.scripts.train -s <scene> [--ours_new ...]
"""

from __future__ import annotations

import os
import sys
import uuid
from pathlib import Path

import numpy as np

from rain_tpu import config as cfg_mod
from rain_tpu.cache import enable_compile_cache


def main(argv=None):
    enable_compile_cache()
    # multi-host bring-up (env-var gated; no-op for single-host runs)
    from rain_tpu.parallel.distributed import initialize_from_env
    initialize_from_env()
    parser = cfg_mod.build_parser("rain-tpu training")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[30000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--output_path", type=str, default="./output/")
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--white_bg", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--viewer", action="store_true",
                        help="serve the SIBR live viewer")
    args = parser.parse_args(argv)
    args.white_background = args.white_background or args.white_bg
    args.save_iterations = list(args.save_iterations) + [args.iterations]

    cfgs = cfg_mod.extract_all(args)
    cfgs = cfg_mod.apply_method_presets(cfgs, args.source_path)
    model = cfgs["model"]
    rain = cfgs["rain"]

    import jax
    if cfgs["pipeline"].detect_anomaly:
        # counterpart of torch.autograd.set_detect_anomaly
        # (reference train.py:234,295): fail at the first NaN-producing
        # op with its traceback
        jax.config.update("jax_debug_nans", True)
    # in a multi-host run only process 0 writes shared provenance files
    is_proc0 = jax.process_index() == 0

    # output dir resolution (train.py:154-169)
    if model.model_path:
        model_path = model.model_path
    elif args.exp_name:
        model_path = os.path.join(args.output_path, args.exp_name)
    else:
        model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    print(f"Output folder: {model_path}")
    Path(model_path).mkdir(parents=True, exist_ok=True)
    if is_proc0:
        cfg_mod.save_config(cfgs, Path(model_path) / "cfg_args.json")
        (Path(model_path) / "command_line.txt").write_text(
            " ".join(sys.argv))

    from rain_tpu.data.dataset import load_scene
    from rain_tpu.train.trainer import Trainer

    rng = np.random.default_rng(cfgs["system"].seed)
    scene = load_scene(
        model.source_path,
        images_dir=model.images,
        eval_split=True,                       # train.py:261 forces eval
        num_cams=rain.num_cams,
        resolution=model.resolution,
        rain_cfg=rain,
        white_background=model.white_background,
        rng=rng)
    print(f"cameras: {len(scene.train_cameras)} train / "
          f"{len(scene.test_cameras)} test; "
          f"init points: {scene.points.shape[0]}")

    # provenance files (reference scene/__init__.py:36-55): the input point
    # cloud and the camera poses used for this run — process 0 only, so a
    # multi-host run doesn't race N processes on the same files
    if is_proc0:
        import json as _json
        from rain_tpu.data import ply as _ply
        from rain_tpu.data.cameras import fov2focal as _f2f
        _ply.write_point_cloud(Path(model_path) / "input.ply", scene.points,
                               scene.colors * 255.0)
        cam_entries = []
        for cid, cam in enumerate(scene.test_cameras + scene.train_cameras):
            W2C = np.linalg.inv(cam.world_view)
            cam_entries.append({
                "id": cid, "img_name": cam.image_name,
                "width": cam.width, "height": cam.height,
                "position": W2C[:3, 3].tolist(),
                "rotation": [r.tolist() for r in W2C[:3, :3]],
                "fy": _f2f(cam.fovy, cam.height),
                "fx": _f2f(cam.fovx, cam.width)})
        (Path(model_path) / "cameras.json").write_text(
            _json.dumps(cam_entries))

    viewer = None
    if args.viewer:
        from rain_tpu.viewer.network_gui import NetworkGUI
        viewer = NetworkGUI(args.ip, args.port)
        print(f"GUI server started at {viewer.host}:{viewer.port}")
    # --quiet: counterpart of reference safe_state(args.quiet)
    # (utils/general_utils.py:86-90) — silence progress logging; file
    # artifacts (log_file.txt, TB, checkpoints) are still written
    log_fn = (lambda *a, **k: None) if args.quiet else print
    trainer = Trainer(scene, cfgs, model_path, viewer=viewer,
                      log_fn=log_fn)
    trainer.train(
        iterations=cfgs["opt"].iterations,
        test_iterations=tuple(args.test_iterations),
        save_iterations=tuple(args.save_iterations),
        checkpoint_iterations=tuple(args.checkpoint_iterations),
        start_checkpoint=args.start_checkpoint)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
