"""Checkpoint save/restore: full training state + PLY interchange.

Two mechanisms, mirroring the reference (SURVEY §5):
1. full checkpoint (npz): params + Adam moments + densification stats +
   iteration + spatial_lr_scale — the counterpart of
   ``torch.save((gaussians.capture(), iteration))`` (train.py:149-151,
   gaussian_model.py:51-83). Only the alive prefix is stored, so files
   are capacity-independent; restore pads to any capacity.
2. PLY snapshots via data.ply.write_gaussians / read_gaussians with the
   exact reference attribute schema (scene/__init__.py:77-79).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from rain_tpu.data import ply as ply_io
from rain_tpu.model import adam as adam_mod
from rain_tpu.model import gaussians as gmod


def save_checkpoint(path, state: gmod.GaussianState,
                    opt: adam_mod.AdamState, iteration: int,
                    spatial_lr_scale: float):
    n = int(state.n_alive)
    payload = {"iteration": iteration, "n_alive": n,
               "spatial_lr_scale": spatial_lr_scale,
               "adam_step": int(opt.step)}
    for name in gmod.GaussianParams._fields:
        i = gmod.GaussianParams._fields.index(name)
        payload[f"params.{name}"] = np.asarray(state.params[i][:n])
        payload[f"mu.{name}"] = np.asarray(opt.mu[i][:n])
        payload[f"nu.{name}"] = np.asarray(opt.nu[i][:n])
    payload["max_radii2d"] = np.asarray(state.max_radii2d[:n])
    payload["xyz_gradient_accum"] = np.asarray(state.xyz_gradient_accum[:n])
    payload["denom"] = np.asarray(state.denom[:n])
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **payload)


def load_checkpoint(path, capacity: int | None = None):
    """Returns (state, opt, iteration, spatial_lr_scale)."""
    z = np.load(path)
    n = int(z["n_alive"])
    capacity = capacity or n
    assert capacity >= n

    st = gmod.from_arrays(
        xyz=z["params.xyz"], f_dc=z["params.features_dc"],
        f_rest=z["params.features_rest"], scaling=z["params.scaling"],
        rotation=z["params.rotation"], opacity=z["params.opacity"],
        capacity=capacity)

    def stat(name):
        full = np.zeros(capacity, np.float32)
        full[:n] = z[name]
        return jnp.asarray(full)

    st = st._replace(max_radii2d=stat("max_radii2d"),
                     xyz_gradient_accum=stat("xyz_gradient_accum"),
                     denom=stat("denom"))

    opt = adam_mod.init(st.params)

    def moments(prefix):
        leaves = []
        for name in gmod.GaussianParams._fields:
            i = gmod.GaussianParams._fields.index(name)
            full = np.zeros_like(np.asarray(opt.mu[i]))
            full[:n] = z[f"{prefix}.{name}"]
            leaves.append(jnp.asarray(full))
        return gmod.GaussianParams(*leaves)

    opt = adam_mod.AdamState(mu=moments("mu"), nu=moments("nu"),
                             step=jnp.asarray(int(z["adam_step"]),
                                              jnp.int32))
    return st, opt, int(z["iteration"]), float(z["spatial_lr_scale"])


def save_ply_snapshot(path, state: gmod.GaussianState):
    """scene.save(iteration) equivalent (scene/__init__.py:77-79)."""
    n = int(state.n_alive)
    p = state.params
    ply_io.write_gaussians(
        path, np.asarray(p.xyz[:n]), np.asarray(p.features_dc[:n]),
        np.asarray(p.features_rest[:n]), np.asarray(p.opacity[:n]),
        np.asarray(p.scaling[:n]), np.asarray(p.rotation[:n]))


def load_ply_snapshot(path, max_sh_degree: int = 3,
                      capacity: int | None = None) -> gmod.GaussianState:
    d = ply_io.read_gaussians(path, max_sh_degree)
    return gmod.from_arrays(
        xyz=d["xyz"], f_dc=d["f_dc"], f_rest=d["f_rest"],
        scaling=d["scaling"], rotation=d["rotation"], opacity=d["opacity"],
        capacity=capacity or d["xyz"].shape[0])
