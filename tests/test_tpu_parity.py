"""Compiled-TPU vs interpret-mode kernel parity (auto-skips off-TPU).

The CPU suite runs the Pallas compositor in interpret mode, which cannot
catch Mosaic-only regressions in the backward kernel's DMA/carry state
machine (ops/tile_render.py:_bwd_kernel — the boundary-window carry and
its flush ordering only exist compiled). This test runs the same packed
instance stream through both paths ON the chip and compares.

Run on hardware with:
  RAIN_TPU_TEST_PLATFORM= python -m pytest tests/test_tpu_parity.py
(empty value → the conftest leaves platform selection to the axon TPU
plugin, whose backend registers under the name "tpu"; the default 'cpu'
pin skips here, and '=axon' fails — it is a jax_platforms alias, not a
backend name).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.sh import rgb_to_sh_dc
from tests.conftest import make_camera


def _pack_scene(width=96, height=64, n=600, max_instances=4096, seed=7):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-1.5, 1.5, (n, 2)),
                          rng.uniform(2.0, 8.0, (n, 1))],
                         axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = gmod.from_arrays(
        xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
        f_rest=np.zeros((n, 15, 3), np.float32),
        scaling=rng.uniform(-3.5, -2.0, (n, 3)).astype(np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=rng.uniform(-1.0, 2.0, (n, 1)).astype(np.float32),
        capacity=n)
    camera = make_camera(width, height, fovx=0.9, fovy=0.62)
    alive = gmod.alive_mask(state)
    scales, quats, opac, shs = gmod.activate(state.params)
    grid_x, grid_y = (width + 15) // 16, (height + 15) // 16
    prep = proj_ops.preprocess(
        state.params.xyz, scales, quats, opac, shs, alive, sh_degree=3,
        world_view=camera["world_view"], full_proj=camera["full_proj"],
        camera_center=camera["camera_center"],
        tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
        width=width, height=height, low_pass=0.3)
    binn = binning_ops.bin_gaussians(prep, grid_x, grid_y, max_instances)
    z = jnp.zeros_like(prep.depth)
    table = jnp.stack([
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.xy[:, 0], prep.xy[:, 1], prep.opacity,
        prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
        prep.depth, z, z, z, z, z, z], axis=-1)
    table = jnp.concatenate([table, jnp.zeros_like(table[:1])], axis=0)
    pack = table[binn.gauss_idx].T
    return pack, binn, grid_x


@pytest.mark.skipif(jax.default_backend() not in ("tpu",),
                    reason="needs a real TPU chip")
def test_compiled_matches_interpret():
    pack, binn, grid_x = _pack_scene()
    starts, ends = binn.tile_start, binn.tile_end
    toff = jnp.zeros((1,), jnp.int32)

    t_tpu = tile_render._composite_fwd_impl(pack, starts, ends, toff,
                                            grid_x=grid_x, interpret=False)
    t_int = tile_render._composite_fwd_impl(pack, starts, ends, toff,
                                            grid_x=grid_x, interpret=True)
    d = float(jnp.max(jnp.abs(t_tpu - t_int)))
    assert d < 5e-4, d

    gtile = jax.random.normal(jax.random.PRNGKey(0), t_tpu.shape,
                              jnp.float32) * 0.1
    g_tpu = tile_render._composite_bwd_impl(
        pack, starts, ends, toff, t_tpu, gtile, grid_x=grid_x,
        interpret=False)
    g_int = tile_render._composite_bwd_impl(
        pack, starts, ends, toff, t_int, gtile, grid_x=grid_x,
        interpret=True)
    m = int(binn.num_instances)
    db = float(jnp.max(jnp.abs(g_tpu[:, :m] - g_int[:, :m])))
    scale = float(jnp.max(jnp.abs(g_int[:, :m]))) + 1e-8
    assert db / scale < 1e-3, (db, scale)
