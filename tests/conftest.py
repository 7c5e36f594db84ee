"""Test configuration: run on a virtual 8-device CPU mesh.

Pallas kernels automatically run in interpreter mode off-TPU
(ops.tile_render._interpret_default). Multi-chip sharding tests use the
8 virtual CPU devices (the standard JAX stand-in for a TPU slice).
"""

import os

_PLATFORM = os.environ.get("RAIN_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon TPU plugin (when present) force-sets jax_platforms="axon,cpu"
# from sitecustomize at interpreter start, overriding JAX_PLATFORMS — the
# tests would then silently run against the one real TPU chip (slow
# remote compiles for every tiny shape). Re-assert the platform through
# the config, which wins as long as no backend has initialized yet.
if _PLATFORM and jax.config.jax_platforms != _PLATFORM:
    jax.config.update("jax_platforms", _PLATFORM)

import jax.numpy as jnp  # noqa: E402

from rain_tpu.cache import enable_compile_cache  # noqa: E402
from rain_tpu.data.cameras import Camera  # noqa: E402

enable_compile_cache()


def make_scene(n=200, seed=0, z_range=(2.0, 6.0), scale_range=(-3.5, -2.0),
               opac_bias=0.0):
    """Random post-activation Gaussian scene in front of a +z camera."""
    rng = np.random.default_rng(seed)
    means = np.concatenate([rng.uniform(-1, 1, (n, 2)),
                            rng.uniform(*z_range, (n, 1))],
                           axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(*scale_range, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(opac_bias, 1.0, n)))).astype(
        np.float32)
    shs = rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    return dict(means=jnp.asarray(means), scales=jnp.asarray(scales),
                quats=jnp.asarray(quats), opac=jnp.asarray(opac),
                shs=jnp.asarray(shs), alive=jnp.asarray(alive))


def make_camera(width, height, fovx=0.8, fovy=0.6):
    cam = Camera(uid=0, image_name="test", R=np.eye(3), T=np.zeros(3),
                 fovx=fovx, fovy=fovy, image=None, width=width,
                 height=height)
    return {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}


@pytest.fixture
def scene():
    return make_scene()


@pytest.fixture
def camera():
    return make_camera(48, 64)
