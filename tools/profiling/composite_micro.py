"""Micro-benchmark: composite fwd/bwd alone at the garden-proxy shape.

RAIN_TPU_TILE_BATCH=1|4 python tools/profiling/composite_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402


def main():
    from rain_tpu.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from rain_tpu.data.cameras import Camera
    from rain_tpu.model import gaussians as gmod
    from rain_tpu.ops import binning as binning_ops
    from rain_tpu.ops import projection as proj_ops
    from rain_tpu.ops import render as render_ops
    from rain_tpu.ops import tile_render
    from rain_tpu.ops.sh import rgb_to_sh_dc

    width, height = 1297, 840
    n = 262_144
    M = 1 << 20
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-3, 3, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = gmod.from_arrays(
        xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
        f_rest=np.zeros((n, 15, 3), np.float32),
        scaling=np.full((n, 3), -4.5, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.full((n, 1), -1.0, np.float32), capacity=n)
    cam = Camera(uid=0, image_name="b", R=np.eye(3), T=np.zeros(3),
                 fovx=1.0, fovy=0.7, image=None, width=width, height=height)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    scales, quats, opac, shs = gmod.activate(state.params)
    grid_x = (width + 15) // 16
    grid_y = (height + 15) // 16
    prep = proj_ops.preprocess(
        state.params.xyz, scales, quats, opac, shs,
        gmod.alive_mask(state), sh_degree=3,
        world_view=camera["world_view"], full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=width, height=height, low_pass=0.3)
    table10 = jnp.stack([
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
        prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
        prep.depth], axis=0)
    n_tiles = grid_x * grid_y
    pack, total, _ = binning_ops.sorted_pack(
        table10, prep.tiles_touched, prep.rect_min, prep.rect_wh,
        jnp.asarray(0, jnp.int32), grid_x, n_tiles, M)
    starts, ends = binning_ops.tile_ranges(
        prep.rect_min, prep.rect_wh, prep.tiles_touched > 0, grid_x,
        n_tiles, jnp.asarray(0, jnp.int32), M)
    toff = jnp.zeros((1,), jnp.int32)
    pack, starts, ends = jax.block_until_ready((pack, starts, ends))
    print(f"instances={int(total)} tiles={n_tiles} "
          f"B={getattr(tile_render, 'TILE_BATCH', 1)} "
          f"CHUNK={tile_render.CHUNK}")

    fwd = jax.jit(lambda p, s, e: tile_render._composite_fwd_impl(
        p, s, e, toff, grid_x=grid_x, interpret=False))
    tiles = jax.block_until_ready(fwd(pack, starts, ends))
    t0 = time.perf_counter()
    for _ in range(20):
        tiles = fwd(pack, starts, ends)
    jax.block_until_ready(tiles)
    print(f"fwd: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")

    gt = jnp.ones_like(tiles)
    bwd = jax.jit(lambda p, s, e, t, g: tile_render._composite_bwd_impl(
        p, s, e, toff, t, g, grid_x=grid_x, interpret=False))
    out = jax.block_until_ready(bwd(pack, starts, ends, tiles, gt))
    t0 = time.perf_counter()
    for _ in range(20):
        out = bwd(pack, starts, ends, tiles, gt)
    jax.block_until_ready(out)
    print(f"bwd: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
