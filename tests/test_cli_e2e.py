"""End-to-end real-data-path tests: on-disk COLMAP/Blender scenes driven
through the actual CLIs (scripts.train / scripts.render / scripts.metrics).

Counterpart of the reference's primary artifacts:
`python train.py -s <scene>` (train.py:226-296), `render.py:45-82`, and
`metrics.py:27-84` — exercised here on tiny synthetic scenes written to
disk in the exact COLMAP binary / Blender transforms formats, so the
dataset readers (data/dataset.py), init policies, resolution policy, and
all three CLI mains run for real in the default suite.
"""

import json
import struct
from pathlib import Path

import numpy as np
import pytest

from rain_tpu import config as cfg_mod
from rain_tpu.data import dataset as dataset_mod

WIDTH, HEIGHT = 64, 48
N_CAMS = 6
N_PTS = 400


def _rotmat2qvec(R):
    """Inverse of colmap.qvec2rotmat (standard Shepperd method)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1],
         R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]]]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


def _look_at(pos):
    """COLMAP world-to-camera rotation with camera +z toward the origin."""
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(fwd, up)) > 0.95:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    return np.stack([right, down, fwd])       # rows: x, y, z camera axes


def _write_colmap_scene(root: Path, rng):
    """Tiny COLMAP dataset: sparse/0/{cameras,images,points3D}.bin +
    images/*.png (cameras on a circle looking at a point cloud cube)."""
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    (root / "images").mkdir()

    fx = fy = 60.0
    buf = struct.pack("<Q", 1)
    buf += struct.pack("<iiQQ", 1, 1, WIDTH, HEIGHT)       # PINHOLE
    buf += struct.pack("<4d", fx, fy, WIDTH / 2, HEIGHT / 2)
    (sparse / "cameras.bin").write_bytes(buf)

    positions = []
    buf = struct.pack("<Q", N_CAMS)
    for i in range(N_CAMS):
        ang = 2 * np.pi * i / N_CAMS
        pos = np.array([4.0 * np.cos(ang), 4.0 * np.sin(ang), 1.5])
        positions.append(pos)
        Rw2c = _look_at(pos)
        q = _rotmat2qvec(Rw2c)
        t = -Rw2c @ pos
        buf += struct.pack("<i7di", i + 1, *q, *t, 1)
        buf += f"img_{i:03d}.png".encode() + b"\x00"
        buf += struct.pack("<Q", 0)
        img = np.zeros((HEIGHT, WIDTH, 3), np.uint8)
        img[..., 0] = np.linspace(0, 255, WIDTH)[None, :]
        img[..., 1] = np.linspace(0, 255, HEIGHT)[:, None]
        img[..., 2] = int(255 * i / N_CAMS)
        from PIL import Image
        Image.fromarray(img).save(root / "images" / f"img_{i:03d}.png")
    (sparse / "images.bin").write_bytes(buf)

    xyz = rng.uniform(-1, 1, (N_PTS, 3))
    rgb = rng.integers(0, 255, (N_PTS, 3))
    err = rng.random(N_PTS) * 2.0
    buf = struct.pack("<Q", N_PTS)
    for i in range(N_PTS):
        buf += struct.pack("<Q3d3BdQ", i, *xyz[i], *rgb[i], err[i], 0)
    (sparse / "points3D.bin").write_bytes(buf)
    return xyz, rgb, err


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("colmap_scene")
    rng = np.random.default_rng(7)
    xyz, rgb, err = _write_colmap_scene(root, rng)
    return root, xyz, rgb, err


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender_scene")
    from PIL import Image
    rng = np.random.default_rng(3)
    for split, n in (("train", 3), ("test", 2)):
        frames = []
        for i in range(n):
            ang = 2 * np.pi * (i + (0.5 if split == "test" else 0)) / 4
            pos = np.array([3 * np.cos(ang), 3 * np.sin(ang), 1.0])
            fwd = -pos / np.linalg.norm(pos)
            up = np.array([0.0, 0.0, 1.0])
            right = np.cross(fwd, up)
            right /= np.linalg.norm(right)
            upv = np.cross(right, fwd)
            c2w = np.eye(4)
            # OpenGL/Blender convention: camera looks down -z
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, upv, -fwd
            c2w[:3, 3] = pos
            name = f"r_{i}"
            rgba = rng.integers(0, 255, (HEIGHT, WIDTH, 4)).astype(np.uint8)
            rgba[..., 3] = (rng.random((HEIGHT, WIDTH)) > 0.5) * 255
            (root / split).mkdir(exist_ok=True)
            Image.fromarray(rgba).save(root / split / f"{name}.png")
            frames.append({"file_path": f"{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        (root / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": 0.9, "frames": frames}))
    return root


# ---------------------------------------------------------------------------
# dataset readers, init policies, resolution policy
# ---------------------------------------------------------------------------

def test_colmap_loader_sfm_default(colmap_scene):
    root, xyz, rgb, _ = colmap_scene
    scene = dataset_mod.load_scene(
        str(root), eval_split=True, num_cams=3, resolution=1,
        rain_cfg=cfg_mod.RainParams())
    # llffhold = 6/3 = 2 → even indices train, odd test
    assert len(scene.train_cameras) == 3
    assert len(scene.test_cameras) == 3
    assert scene.points.shape == (N_PTS, 3)
    np.testing.assert_allclose(scene.points, xyz, rtol=1e-6)
    np.testing.assert_allclose(scene.colors, rgb / 255.0, atol=1e-7)
    assert scene.nerf_radius > 0
    for cam in scene.train_cameras:
        assert cam.image.shape == (3, HEIGHT, WIDTH)
        # GT images round-trip through PNG encode/resize
        assert cam.image.min() >= 0 and cam.image.max() <= 1


def test_colmap_camera_geometry(colmap_scene):
    """Projecting the scene center through each loaded camera lands at the
    image center — validates the qvec/tvec → (R, T) → view matrix chain."""
    root, *_ = colmap_scene
    scene = dataset_mod.load_scene(
        str(root), eval_split=False, num_cams=3, resolution=1,
        rain_cfg=cfg_mod.RainParams(), load_images=False)
    center = np.array([0.0, 0.0, 0.0, 1.0])
    for cam in scene.train_cameras:
        inp = cam.render_inputs()
        # math convention: p_hom = full_proj @ p (ops/projection.py:11-12)
        ph = np.asarray(inp["full_proj"]) @ center
        ndc = ph[:2] / ph[3]
        assert np.all(np.abs(ndc) < 1e-4), ndc   # cameras look AT center
        pv = np.asarray(inp["world_view"]) @ center
        assert 3.5 < pv[2] < 5.0      # camera ring radius ~4.27


def test_init_policy_noisy_sfm(colmap_scene):
    root, xyz, *_ = colmap_scene
    scene = dataset_mod.load_scene(
        str(root), num_cams=3, rain_cfg=cfg_mod.RainParams(
            train_from="noisy_sfm"),
        load_images=False, rng=np.random.default_rng(1))
    assert scene.points.shape == (N_PTS, 3)
    d = np.linalg.norm(scene.points - xyz, axis=1)
    assert d.mean() > 0.5             # unit-σ noise applied


def test_init_policy_reprojection(colmap_scene):
    root, xyz, _, err = colmap_scene
    # the reference only applies the reprojection filter when one of the
    # random-init meta-flags is set and --ours is not
    # (dataset_readers.py:169-180)
    scene = dataset_mod.load_scene(
        str(root), num_cams=3, rain_cfg=cfg_mod.RainParams(
            ours_new=True, train_from="reprojection"),
        load_images=False)
    thr = np.percentile(err, 10)
    keep = err < thr
    assert scene.points.shape[0] == keep.sum()
    np.testing.assert_allclose(scene.points, xyz[keep], rtol=1e-6)


def test_init_policy_paper_random(colmap_scene):
    root, *_ = colmap_scene
    scene = dataset_mod.load_scene(
        str(root), num_cams=3, rain_cfg=cfg_mod.RainParams(
            paper_random=True, num_gaussians=1234),
        load_images=False)
    assert scene.points.shape == (1234, 3)
    # paper_random samples a cube of side 3·radius around the translate
    assert np.abs(scene.points).max() <= 3 * scene.nerf_radius + 1


def test_init_policy_ours_camera_cube(colmap_scene):
    root, *_ = colmap_scene
    scene = dataset_mod.load_scene(
        str(root), num_cams=3, rain_cfg=cfg_mod.RainParams(
            ours=True, num_gaussians=777),
        load_images=False)
    assert scene.points.shape == (777, 3)
    assert scene.colors.min() >= 0 and scene.colors.max() <= 1


def test_blender_loader(blender_scene):
    scene = dataset_mod.load_scene(
        str(blender_scene), white_background=True, eval_split=True)
    assert len(scene.train_cameras) == 3
    assert len(scene.test_cameras) == 2
    assert scene.points.shape == (100_000, 3)    # random init
    cam = scene.train_cameras[0]
    assert cam.image.shape == (3, HEIGHT, WIDTH)
    # white background composited where alpha = 0
    assert cam.fovx == pytest.approx(0.9)
    # the scene center projects near the image center here too
    inp = cam.render_inputs()
    ph = np.asarray(inp["full_proj"]) @ np.array([0.0, 0.0, 0.0, 1.0])
    assert np.all(np.abs(ph[:2] / ph[3]) < 1e-4)


def test_resolution_policy():
    f = dataset_mod._resolution_for
    assert f(3200, 2400, -1) == (1600, 1200)   # >1600 px wide → cap
    assert f(800, 600, -1) == (800, 600)       # small stays
    assert f(1600, 1200, 2) == (800, 600)      # divider flags
    assert f(1600, 1200, 4) == (400, 300)
    assert f(800, 600, 400) == (400, 300)      # explicit target width


# ---------------------------------------------------------------------------
# the three CLIs, end to end on the on-disk scene
# ---------------------------------------------------------------------------

@pytest.mark.filterwarnings("ignore")
def test_train_render_metrics_cli(colmap_scene, tmp_path):
    root, *_ = colmap_scene
    model_path = tmp_path / "model"

    from rain_tpu.scripts import train as train_cli
    train_cli.main([
        "-s", str(root), "--model_path", str(model_path),
        "--iterations", "20", "--test_iterations", "20",
        "--save_iterations", "20", "--num_cams", "3",
        "--capacity", "4096", "--max_instances", "16384",
        "--log_every", "10", "--resolution", "1", "--quiet"])

    assert (model_path / "cfg_args.json").exists()
    assert (model_path / "command_line.txt").exists()
    assert (model_path / "input.ply").exists()
    cams = json.loads((model_path / "cameras.json").read_text())
    assert len(cams) == N_CAMS
    ply = model_path / "point_cloud" / "iteration_20" / "point_cloud.ply"
    assert ply.exists()
    log = (model_path / "log_file.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert rec["iteration"] == 20
    assert np.isfinite(rec["test"]["psnr"])

    from rain_tpu.scripts import render as render_cli
    render_cli.main(["--model_path", str(model_path), "-s", str(root),
                     "--num_cams", "3", "--resolution", "1"])
    test_dir = model_path / "test" / "ours_20"
    renders = sorted((test_dir / "renders").iterdir())
    gts = sorted((test_dir / "gt").iterdir())
    assert len(renders) == 3 and len(gts) == 3
    assert (test_dir / "depth").exists()
    assert (test_dir / "depth_inferno").exists()
    train_dir = model_path / "train" / "ours_20"
    assert len(list((train_dir / "renders").iterdir())) == 3

    from rain_tpu.scripts import metrics as metrics_cli
    metrics_cli.main(["-m", str(model_path)])
    results = json.loads((model_path / "results.json").read_text())
    entry = results["ours_20"]
    assert np.isfinite(entry["PSNR"]) and entry["PSNR"] > 5.0
    assert -1.0 <= entry["SSIM"] <= 1.0
    per_view = json.loads((model_path / "per_view.json").read_text())
    assert len(per_view["ours_20"]["PSNR"]) == 3


@pytest.mark.filterwarnings("ignore")
def test_train_cli_resume_from_checkpoint(colmap_scene, tmp_path):
    """--start_checkpoint resumes at the saved iteration (train.py:41-43)."""
    root, *_ = colmap_scene
    model_path = tmp_path / "model_ckpt"
    from rain_tpu.scripts import train as train_cli
    args = ["-s", str(root), "--model_path", str(model_path),
            "--test_iterations", "-1", "--num_cams", "3",
            "--capacity", "4096", "--max_instances", "16384",
            "--resolution", "1", "--quiet"]
    train_cli.main(args + ["--iterations", "10",
                           "--save_iterations", "10",
                           "--checkpoint_iterations", "10"])
    ckpt = model_path / "chkpnt10.npz"
    assert ckpt.exists()
    train_cli.main(args + ["--iterations", "15", "--save_iterations", "15",
                           "--start_checkpoint", str(ckpt)])
    assert (model_path / "point_cloud" / "iteration_15" /
            "point_cloud.ply").exists()


# ---------------------------------------------------------------------------
# text-format COLMAP sparse models + the render_only flow
# ---------------------------------------------------------------------------

def _binary_to_text_sparse(root: Path, out: Path):
    """Rewrite the binary sparse model as the COLMAP text format."""
    from rain_tpu.data import colmap
    sparse = root / "sparse" / "0"
    out.mkdir(parents=True)
    cams = colmap.read_cameras_binary(sparse / "cameras.bin")
    lines = []
    for c in cams.values():
        lines.append(f"{c.id} {c.model} {c.width} {c.height} " +
                     " ".join(str(p) for p in c.params))
    (out / "cameras.txt").write_text("\n".join(lines) + "\n")
    imgs = colmap.read_images_binary(sparse / "images.bin")
    lines = []
    for im in imgs.values():
        q = " ".join(repr(float(v)) for v in im.qvec)
        t = " ".join(repr(float(v)) for v in im.tvec)
        lines.append(f"{im.id} {q} {t} {im.camera_id} {im.name}")
        lines.append("")      # empty 2D-point list line
    (out / "images.txt").write_text("\n".join(lines) + "\n")
    xyz, rgb, err = colmap._read_points3d_binary_py(sparse / "points3D.bin")
    lines = []
    for i in range(len(xyz)):
        lines.append(f"{i} {float(xyz[i,0])!r} {float(xyz[i,1])!r} {float(xyz[i,2])!r} "
                     f"{int(rgb[i,0])} {int(rgb[i,1])} {int(rgb[i,2])} "
                     f"{float(err[i,0])!r}")
    (out / "points3D.txt").write_text("\n".join(lines) + "\n")


def test_colmap_text_format_matches_binary(colmap_scene, tmp_path):
    """Text-format sparse models load identically to binary
    (colmap_loader text variants, scene/colmap_loader.py)."""
    import shutil
    root, xyz, rgb, err = colmap_scene
    troot = tmp_path / "text_scene"
    _binary_to_text_sparse(root, troot / "sparse" / "0")
    shutil.copytree(root / "images", troot / "images")

    sb = dataset_mod.load_scene(str(root), num_cams=3,
                                rain_cfg=cfg_mod.RainParams(),
                                load_images=False)
    st = dataset_mod.load_scene(str(troot), num_cams=3,
                                rain_cfg=cfg_mod.RainParams(),
                                load_images=False)
    assert len(st.train_cameras) == len(sb.train_cameras)
    np.testing.assert_allclose(st.points, sb.points, rtol=1e-12)
    np.testing.assert_allclose(st.colors, sb.colors, atol=1e-12)
    for ca, cb in zip(st.train_cameras, sb.train_cameras):
        np.testing.assert_allclose(ca.R, cb.R, atol=1e-12)
        np.testing.assert_allclose(ca.T, cb.T, atol=1e-12)
        assert ca.fovx == pytest.approx(cb.fovx)


@pytest.mark.filterwarnings("ignore")
def test_render_only_from_result_ply(colmap_scene, tmp_path):
    """--render_only loads result.ply from the scene dir instead of the
    init point cloud (reference render.py:78, dataset_readers.py:215)."""
    import shutil
    root, *_ = colmap_scene
    model_path = tmp_path / "model_ro"
    from rain_tpu.scripts import train as train_cli
    from rain_tpu.scripts import render as render_cli
    train_cli.main([
        "-s", str(root), "--model_path", str(model_path),
        "--iterations", "5", "--test_iterations", "-1",
        "--save_iterations", "5", "--num_cams", "3",
        "--capacity", "1024", "--max_instances", "16384",
        "--resolution", "1", "--quiet"])
    # a scene dir whose result.ply is the trained model
    ro_scene = tmp_path / "ro_scene"
    shutil.copytree(root, ro_scene)
    shutil.copy(model_path / "point_cloud" / "iteration_5" /
                "point_cloud.ply", ro_scene / "result.ply")
    render_cli.main(["--model_path", str(model_path), "-s", str(ro_scene),
                     "--render_only", "--num_cams", "3",
                     "--resolution", "1"])
    # render_only keeps every camera in the train split
    renders = list((model_path / "train" / "ours_5" / "renders").iterdir())
    assert len(renders) == N_CAMS


# ---------------------------------------------------------------------------
# get_combined_args override semantics (arguments/__init__.py:82-102)
# ---------------------------------------------------------------------------

def test_explicit_cli_flags_override_saved_config(tmp_path):
    """Any explicitly-passed CLI flag beats the saved config; every other
    flag takes the saved value (reference get_combined_args)."""
    import dataclasses
    from rain_tpu import config as cfg_mod

    saved_path = tmp_path / "cfg_args.json"
    base = {name: cls() for name, cls in cfg_mod.GROUPS.items()}
    base["model"] = dataclasses.replace(
        base["model"], white_background=True, resolution=2,
        source_path="/saved/scene", sh_degree=2)
    base["rain"] = dataclasses.replace(base["rain"], num_cams=7)
    cfg_mod.save_config(base, saved_path)

    argv = ["-m", str(tmp_path), "--resolution", "4"]
    explicit = cfg_mod.explicit_flag_names(argv)
    assert "resolution" in explicit and "model_path" in explicit
    assert "white_background" not in explicit

    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args(argv))
    merged = cfg_mod.merge_saved(
        cfgs, cfg_mod.load_config(saved_path), explicit)
    assert merged["model"].resolution == 4            # explicit CLI wins
    assert merged["model"].white_background is True   # saved wins
    assert merged["model"].source_path == "/saved/scene"
    assert merged["model"].sh_degree == 2
    assert merged["rain"].num_cams == 7

    # boolean + shorthand: -w is explicit, overrides saved False
    base["model"] = dataclasses.replace(base["model"],
                                        white_background=False)
    cfg_mod.save_config(base, saved_path)
    argv = ["-m", str(tmp_path), "-w"]
    explicit = cfg_mod.explicit_flag_names(argv)
    assert "white_background" in explicit
    merged = cfg_mod.merge_saved(
        cfg_mod.extract_all(parser.parse_args(argv)),
        cfg_mod.load_config(saved_path), explicit)
    assert merged["model"].white_background is True


def test_render_cli_explicit_override_e2e(colmap_scene, tmp_path):
    """render.py: --white_background / --sh_degree passed explicitly win
    over the saved training config."""
    root, *_ = colmap_scene
    model_path = tmp_path / "model_ov"
    from rain_tpu.scripts import render as render_cli
    from rain_tpu.scripts import train as train_cli
    train_cli.main([
        "-s", str(root), "--model_path", str(model_path),
        "--iterations", "5", "--test_iterations", "-1",
        "--save_iterations", "5", "--num_cams", "3",
        "--capacity", "1024", "--max_instances", "16384",
        "--resolution", "1", "--quiet"])
    # the trained model covers little of the frame: a white background
    # forced at render time must brighten the mean image vs the saved
    # black background
    render_cli.main(["--model_path", str(model_path), "-s", str(root),
                     "--skip_train", "--resolution", "1"])
    from PIL import Image
    test_dir = model_path / "test" / "ours_5"
    p = sorted((test_dir / "renders").iterdir())[0]
    black_mean = np.asarray(Image.open(p), np.float32).mean()
    render_cli.main(["--model_path", str(model_path), "-s", str(root),
                     "--skip_train", "--resolution", "1",
                     "--white_background"])
    white_mean = np.asarray(Image.open(p), np.float32).mean()
    assert white_mean > black_mean + 50.0


def test_lpips_unavailable_warning(capsys):
    """When LPIPS weights are absent a one-line warning explains the
    missing metric (instead of silently omitting it)."""
    from rain_tpu.eval import lpips as lpips_mod
    lpips_mod._load_weights.warned = False
    msgs = []
    assert lpips_mod.lpips_fn_or_none(log_fn=msgs.append) is None or msgs
    if msgs:   # weights absent in this environment
        assert "LPIPS" in msgs[0]
        # warned only once per process
        lpips_mod.lpips_fn_or_none(log_fn=msgs.append)
        assert len(msgs) == 1
