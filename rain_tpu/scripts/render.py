"""Offline render CLI — counterpart of reference render.py.

Loads a trained model (latest or given iteration PLY snapshot) and renders
every train/test view, saving color, normalized depth, and an
inferno-colormapped depth image (reference render.py:19-43).

Usage: python -m rain_tpu.scripts.render -m <model_path> [-s <scene>]
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from rain_tpu import config as cfg_mod


def _search_max_iteration(folder: Path) -> int:
    """(reference utils/system_utils.py:15-17)."""
    return max(int(p.name.split("_")[-1]) for p in folder.iterdir())


def _save_image(path, arr):
    """arr [3,H,W] or [H,W] in [0,1] → PNG."""
    from PIL import Image
    arr = np.asarray(arr)
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    img = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).save(path)


def _inferno(x):
    """Minimal inferno colormap (matplotlib-free)."""
    stops = np.array([
        [0.001, 0.000, 0.014], [0.253, 0.037, 0.407], [0.550, 0.161, 0.506],
        [0.798, 0.280, 0.470], [0.950, 0.533, 0.295], [0.988, 0.809, 0.145],
        [0.988, 0.998, 0.645]])
    x = np.clip(x, 0, 1) * (len(stops) - 1)
    i = np.clip(x.astype(int), 0, len(stops) - 2)
    f = (x - i)[..., None]
    return stops[i] * (1 - f) + stops[i + 1] * f


def render_set(model_path, name, iteration, cameras, state, cfgs,
               max_instances):
    import jax.numpy as jnp
    from rain_tpu.train import step as step_mod

    base = Path(model_path) / name / f"ours_{iteration}"
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfgs["model"].white_background
                     else [0.0, 0.0, 0.0], jnp.float32)
    for idx, cam in enumerate(cameras):
        camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
        out = step_mod.eval_render(
            state, camera, bg, jnp.asarray(0.3, jnp.float32),
            width=cam.width, height=cam.height,
            sh_degree=cfgs["model"].sh_degree, max_instances=max_instances)
        _save_image(base / "renders" / f"{idx:05d}.png", out.render)
        depth = np.asarray(out.depth[0])
        dmax = depth.max() if depth.max() > 0 else 1.0
        _save_image(base / "depth" / f"{idx:05d}.png", depth / dmax)
        _save_image(base / "depth_inferno" / f"{idx:05d}.png",
                    _inferno(depth / dmax).transpose(2, 0, 1))
        if cam.image is not None:
            _save_image(base / "gt" / f"{idx:05d}.png", cam.image)
    print(f"rendered {len(cameras)} {name} views → {base}")


def main(argv=None):
    parser = cfg_mod.build_parser("rain-tpu rendering")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--render_only", action="store_true",
                        help="load result.ply from the scene dir")
    args = parser.parse_args(argv)

    cfgs = cfg_mod.extract_all(args)
    saved = Path(args.model_path) / "cfg_args.json"
    if saved.exists():
        # full get_combined_args semantics (arguments/__init__.py:82-102):
        # saved config is the base, any explicitly-passed CLI flag wins
        explicit = cfg_mod.explicit_flag_names(argv)
        explicit.add("model_path")  # -m names this run; never the saved one
        cfgs = cfg_mod.merge_saved(cfgs, cfg_mod.load_config(saved),
                                   explicit)
    model = cfgs["model"]

    from rain_tpu.data.dataset import load_scene
    from rain_tpu.train import checkpoint as ckpt

    scene = load_scene(
        model.source_path, images_dir=model.images, eval_split=True,
        num_cams=cfgs["rain"].num_cams, resolution=model.resolution,
        rain_cfg=cfgs["rain"], white_background=model.white_background,
        render_only=args.render_only)

    if args.iteration == -1:
        iteration = _search_max_iteration(
            Path(args.model_path) / "point_cloud")
    else:
        iteration = args.iteration
    ply = (Path(args.model_path) / "point_cloud" /
           f"iteration_{iteration}" / "point_cloud.ply")
    state = ckpt.load_ply_snapshot(ply, max_sh_degree=model.sh_degree)
    print(f"loaded {int(state.n_alive)} gaussians from {ply}")
    max_instances = max(int(state.n_alive) * 8, 262144)

    if not args.skip_train:
        render_set(args.model_path, "train", iteration,
                   scene.train_cameras, state, cfgs, max_instances)
    if not args.skip_test:
        render_set(args.model_path, "test", iteration,
                   scene.test_cameras, state, cfgs, max_instances)


if __name__ == "__main__":
    main()
