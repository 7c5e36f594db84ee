"""The host-side training driver.

Counterpart of reference train.py:training() (:24-151): camera sampling,
schedule evaluation (LR / SH degree / c2f low-pass), densify cadence,
opacity resets, eval reports, and checkpointing — orchestrating the jitted
train_step. TPU-specific responsibilities the reference doesn't have:
proactive capacity growth (a re-jit boundary) before densification can
overflow, instance-buffer tier growth with step retry on overflow (the
reference resizes its binning buffers exactly and never trains on
truncated data, rasterize_points.cu:16-22 — we match that contract by
discarding any overflowed step and re-running it at the grown tier),
pipelined step verification (the overflow/NaN flags of each step are
fetched one step late so the device-to-host round trip hides behind the
next step's compute — see _enqueue_step), and multi-chip training
(``system.devices > 1``, parallel.sharding): Gaussian-sharded
preprocess/optimizer + tile-row-sharded rasterization with
reduce-scattered gradients and densification stats.
"""

from __future__ import annotations

import collections
import json
import random
import time
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rain_tpu.data.dataset import SceneData
from rain_tpu.model import adam as adam_mod
from rain_tpu.model import densify as densify_mod
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import losses as loss_ops
from rain_tpu.train import checkpoint as ckpt
from rain_tpu.train import schedules
from rain_tpu.train import step as step_mod


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


def _next_instance_tier(m: int) -> int:
    """Next instance-buffer tier above m on the half-step ladder
    {2^k, 3·2^(k-1)}. The binning sort + expansion kernels are linear in
    the tier size, so half-steps keep the settled tier within 1.5x of
    the true instance count instead of doubling's 2x (at the garden
    end-state: 6.29M tier for 5.44M instances instead of 8.39M — ~25%
    off the sort traffic). Every ladder value >= 65536 is a multiple of
    the expansion chunk and the 32768 shard alignment."""
    p = 1 << (int(m).bit_length() - 1)         # largest pow2 <= m
    for cand in (p + (p >> 1), 2 * p, 3 * p):
        if cand > m:
            return cand
    return 4 * p


class _Verified(NamedTuple):
    """Host-side scalar results of a verified train step."""
    loss: float
    l1: float
    num_instances: int
    instance_overflow: bool
    n_alive: int


@jax.jit
def _pack_flags(aux):
    """[5] f32 device vector so one fetch verifies a whole step.
    Counts travel as int32 bitcast into the f32 lanes so they stay
    integer-exact above 2^24 (instance tiers go to 2^27)."""
    def as_bits(v):
        return jax.lax.bitcast_convert_type(v.astype(jnp.int32),
                                            jnp.float32)
    return jnp.stack([
        aux.loss.astype(jnp.float32),
        aux.instance_overflow.astype(jnp.float32),
        as_bits(aux.num_instances),
        aux.l1.astype(jnp.float32),
        as_bits(aux.n_alive)])


def _unpack_flags(flags):
    """Host-side decode of _pack_flags → (loss, ovf, ninst, l1, n_alive)."""
    f = np.asarray(flags)
    ints = f.view(np.int32)
    return (float(f[0]), float(f[1]), int(ints[2]), float(f[3]),
            int(ints[4]))


class Trainer:
    def __init__(self, scene: SceneData, cfgs: dict, model_path: str,
                 *, log_fn=print, tensorboard: bool = True,
                 viewer=None):
        self.scene = scene
        self.model = cfgs["model"]
        self.opt_cfg = cfgs["opt"]
        self.rain = cfgs["rain"]
        self.system = cfgs["system"]
        self.model_path = Path(model_path)
        self.model_path.mkdir(parents=True, exist_ok=True)
        self.log = log_fn
        self.viewer = viewer
        # multi-host: only process 0 writes TB / checkpoints / PLYs
        # (every process would race on the same files). The ZeRO-style
        # sharded step leaves params/opt state PS-sharded over the
        # GLOBAL mesh, so saves first gather them host-local via
        # _host_local (a collective every process joins).
        self.is_proc0 = jax.process_index() == 0
        self.tb = None
        if tensorboard and self.is_proc0:
            try:  # same optional dependency handling as train.py:17-21
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(str(self.model_path))
            except Exception:
                self.log("Tensorboard not available: not logging progress")

        self.divide_ratio = 0.7 if (self.rain.ours or self.rain.ours_new) \
            else 0.8                                  # train.py:28-32
        self.spatial_lr_scale = scene.nerf_radius

        n0 = scene.points.shape[0]
        # devices: 1 = single chip; N > 1 = Gaussian+tile-row-sharded
        # training over an N-device mesh (parallel.sharding); 0 = all
        # local devices.
        self.n_devices = self.system.devices or len(jax.devices())
        cap = self.system.capacity or max(_round_up(n0 * 2, 4096), 16384)
        if self.n_devices > 1:
            # the sharded step splits the capacity axis across devices
            cap = _round_up(cap, self.n_devices)
        self.state = gmod.create_from_pcd(
            scene.points, scene.colors, sh_degree=self.model.sh_degree,
            capacity=cap)
        self.opt_state = adam_mod.init(self.state.params)
        self._sharded_steps = {}
        # per-shard instance tier in sharded mode: each shard bins only
        # its band, so it needs ~1/n of the global instances (plus slack
        # for uneven bands); grown independently on overflow signals.
        base_instances = self.system.max_instances or max(
            _round_up(n0 * 8, 65536), 262144)
        if self.n_devices > 1:
            self.max_instances = max(
                _round_up(2 * base_instances // self.n_devices, 65536),
                65536)
        else:
            self.max_instances = base_instances

        bg = [1.0, 1.0, 1.0] if self.model.white_background else [0, 0, 0]
        self.background = jnp.asarray(bg, jnp.float32)

        # --profile_steps A-B: jax.profiler trace over those iterations
        self._profile_range = None
        self._profiling = False
        spec = getattr(self.system, "profile_steps", "")
        if spec:
            a, _, b = spec.partition("-")
            self._profile_range = (int(a), int(b or a))

        # Resolution bucketing: with heterogeneous camera sizes (COLMAP
        # scenes with per-camera rounding, dataset.py:57-68) every
        # distinct (w, h) would trigger a full XLA recompile of the step.
        # Instead cameras are padded to tile-aligned size buckets and the
        # step masks the loss to the true size (train_step real_wh) — one
        # compile per bucket, not per size. Single-size scenes keep the
        # exact-size step (zero padding overhead); the sharded step
        # (devices > 1) keeps exact sizes too.
        sizes = {(c.width, c.height) for c in scene.train_cameras}
        self._bucketed = len(sizes) > 1 and self.n_devices == 1
        self._bucket_keys = set()

        self.iteration = 0
        self.low_pass = 0.3
        self.ema_loss = 0.0
        # one-step-lag verification pipeline (see _enqueue_step)
        self._pending = None
        self._last_verified = None
        self._viewpoint_stack = []
        self._rng = random.Random(0)
        self._key = jax.random.key(self.system.seed)
        self._cam_arrays = collections.OrderedDict()
        self.densify_until = (self.opt_cfg.densify_until_iter +
                              self.rain.warmup_iter)  # train.py:38-39
        self.history = []

    # -- camera handling --------------------------------------------------
    def _camera_bundle(self, cam):
        """Device arrays for a camera, LRU-bounded so GT images don't pin
        unbounded HBM (system.camera_cache; 0 keeps everything resident,
        like the reference's cameraList_from_camInfos moving all images
        to the GPU, utils/camera_utils.py:43-49)."""
        if cam.uid in self._cam_arrays:
            self._cam_arrays.move_to_end(cam.uid)
        else:
            limit = self.system.camera_cache
            if limit and len(self._cam_arrays) >= limit:
                self._cam_arrays.popitem(last=False)
            img = cam.image
            if img is not None and self._bucketed:
                # zero-pad the GT to the camera's tile bucket (the step's
                # masked loss requires zeros beyond the true size)
                bw, bh = _round_up(cam.width, 16), _round_up(cam.height, 16)
                if (bw, bh) != (cam.width, cam.height):
                    padded = np.zeros((3, bh, bw), np.float32)
                    padded[:, :cam.height, :cam.width] = img
                    img = padded
            self._cam_arrays[cam.uid] = (
                {k: jnp.asarray(v) for k, v in cam.render_inputs().items()},
                jnp.asarray(img) if img is not None else None)
        return self._cam_arrays[cam.uid]

    def _next_camera(self):
        if not self._viewpoint_stack:
            self._viewpoint_stack = list(self.scene.train_cameras)
        return self._viewpoint_stack.pop(
            self._rng.randint(0, len(self._viewpoint_stack) - 1))

    # -- capacity management ----------------------------------------------
    def _maybe_grow(self, force: bool = False):
        """Grow Gaussian capacity (a re-jit boundary) when the live count
        nears it — or unconditionally when a densify round overflowed
        (its appends were dropped; the next round must have room, like
        the reference's dynamic tensor growth)."""
        n = int(self.state.n_alive)
        cap = self.state.capacity
        if force or n > 0.6 * cap:
            new_cap = _round_up(cap * 2, 4096)
            if self.n_devices > 1:
                new_cap = _round_up(new_cap, self.n_devices)
            limit = getattr(self.system, "max_capacity", 0)
            if limit and new_cap > limit:
                if cap >= limit:
                    self.log(f"[cap] at max_capacity {limit} — not "
                             f"growing (alive {n}); densify appends "
                             f"beyond capacity will be dropped")
                    return
                new_cap = _round_up(limit, 4096)
            self.log(f"[cap] growing capacity {cap} -> {new_cap} "
                     f"(alive {n})")
            self.state = gmod.grow_capacity(self.state, new_cap)
            self.opt_state = adam_mod.AdamState(
                mu=self._pad_params(self.opt_state.mu, new_cap),
                nu=self._pad_params(self.opt_state.nu, new_cap),
                step=self.opt_state.step)

    @staticmethod
    def _pad_params(params: gmod.GaussianParams, new_cap: int):
        def pad(x):
            extra = new_cap - x.shape[0]
            return jnp.concatenate(
                [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)])
        return jax.tree.map(pad, params)

    def _grow_instances(self, min_needed: int = 0):
        """Grow the instance tier; with the overflow step's reported
        instance count, jump straight to the first ladder tier that fits
        (each intermediate tier would cost a discarded step + a full XLA
        recompile)."""
        self.max_instances = _next_instance_tier(self.max_instances)
        while self.max_instances < min_needed:
            self.max_instances = _next_instance_tier(self.max_instances)
        if self.max_instances > (1 << 27):
            raise MemoryError(
                f"instance tier {self.max_instances} exceeds the 2^27 "
                f"sanity bound — scene/shard configuration is pathological")
        self.log(f"[cap] growing instance buffer -> {self.max_instances}")

    # -- one optimization step (single-chip or sharded) --------------------
    def _get_sharded_step(self, width, height, sh_deg, update_stats):
        key = (width, height, sh_deg, self.max_instances,
               self.n_devices, update_stats)
        if key not in self._sharded_steps:
            from rain_tpu.parallel import sharding
            mesh = sharding.make_mesh(self.n_devices)
            self._sharded_steps[key] = sharding.make_sharded_train_step(
                mesh, width=width, height=height, sh_degree=sh_deg,
                max_instances_per_shard=self.max_instances,
                lambda_dssim=self.opt_cfg.lambda_dssim,
                update_densify_stats=update_stats)
        return self._sharded_steps[key]

    def _dispatch(self, args):
        """Dispatch one train step (no host sync). Returns (state, opt,
        flags) with flags a [5] device array [loss, overflow,
        num_instances, l1, n_alive] so verification costs ONE
        device-to-host fetch (each fetch is a full round trip — tens of
        ms on remote-attached chips)."""
        (cam, cam_arrays, gt, bg, low_pass, xyz_lr, sh_deg, opt_leaves,
         update_stats) = args
        lp = jnp.asarray(low_pass, jnp.float32)
        lr = jnp.asarray(xyz_lr, jnp.float32)
        if self.n_devices > 1:
            step = self._get_sharded_step(cam.width, cam.height,
                                          sh_deg, update_stats)
            state, opt, aux = step(
                self.state, self.opt_state, cam_arrays, gt, bg,
                lp, lr, opt_leaves)
        else:
            if self._bucketed:
                width = _round_up(cam.width, 16)
                height = _round_up(cam.height, 16)
                self._bucket_keys.add((width, height))
                real_wh = (jnp.asarray(cam.width, jnp.int32),
                           jnp.asarray(cam.height, jnp.int32))
            else:
                width, height = cam.width, cam.height
                real_wh = None
            state, opt, aux = step_mod.train_step(
                self.state, self.opt_state, cam_arrays, gt, bg,
                lp, lr,
                width=width, height=height, sh_degree=sh_deg,
                max_instances=self.max_instances,
                opt_cfg_leaves=opt_leaves,
                lambda_dssim=self.opt_cfg.lambda_dssim,
                update_densify_stats=update_stats,
                real_wh=real_wh)
        return state, opt, _pack_flags(aux)

    def _enqueue_step(self, args):
        """Pipelined step: dispatch this iteration's step, then verify
        the PREVIOUS in-flight step while this one runs on the device —
        the verification fetch's round-trip hides behind compute instead
        of idling the chip. Exactly one step is ever unverified, and its
        pre-state is retained (the same two state generations JAX keeps
        anyway), so an overflow/NaN discovered one step late rolls back
        and replays both steps — training never proceeds from truncated
        or non-finite data (the reference's exact-resize contract,
        rasterize_points.cu:16-22)."""
        prev = (self.state, self.opt_state)
        state, opt, flags = self._dispatch(args)
        self.state, self.opt_state = state, opt
        new_p = (self.iteration, flags, prev, args)
        old_p = self._pending
        self._pending = new_p
        if old_p is not None:
            self._verify(old_p, refire=True)
        if not self.system.pipeline:
            return self.flush_pending()
        return None

    def _verify(self, pending, refire=False):
        """Blocking verification of an in-flight step (one fetch). On
        overflow: roll back to its pre-state, grow the tier, re-run it
        synchronously, and (refire) re-dispatch the newer in-flight step
        whose input was the discarded state. On non-finite loss: dump
        the pre-step state and abort (reference dgr/__init__.py:73-80).
        Returns the verified scalar values."""
        iteration, flags, (prev_state, prev_opt), args = pending
        loss, ovf, ninst, l1, n_alive = _unpack_flags(flags)
        if ovf > 0.0:
            later = self._pending if refire and \
                self._pending is not pending else None
            self.log(f"[cap] instance overflow at iter {iteration} "
                     f"({int(ninst)} > {self.max_instances}) — discarding "
                     f"step(s) and retrying at a larger tier")
            self.state, self.opt_state = prev_state, prev_opt
            self._pending = None
            self._grow_instances(min_needed=int(ninst))
            verified = self._run_step_sync(args, iteration)
            if later is not None:
                l_iter, _, _, l_args = later
                prev = (self.state, self.opt_state)
                state, opt, lflags = self._dispatch(l_args)
                self.state, self.opt_state = state, opt
                self._pending = (l_iter, lflags, prev, l_args)
            return verified
        if not np.isfinite(loss):
            dump = self.model_path / f"snapshot_iter{iteration}.npz"
            ckpt.save_checkpoint(dump, prev_state, prev_opt,
                                 iteration, self.spatial_lr_scale)
            raise FloatingPointError(
                f"non-finite loss at iteration {iteration}; "
                f"pre-step state dumped to {dump}")
        return _Verified(loss=loss, l1=l1, num_instances=int(ninst),
                         instance_overflow=False, n_alive=int(n_alive))

    def _run_step_sync(self, args, iteration):
        """Synchronous verified step with the overflow-retry loop (the
        reference's exact-resize contract — never train on truncated
        data)."""
        while True:
            prev_state, prev_opt = self.state, self.opt_state
            state, opt, flags = self._dispatch(args)
            loss, ovf, ninst, l1, n_alive = _unpack_flags(flags)
            if ovf > 0.0:
                self.log(f"[cap] instance overflow at iter {iteration} "
                         f"({int(ninst)} > {self.max_instances}) — "
                         f"discarding step and retrying at a larger tier")
                self._grow_instances(min_needed=int(ninst))
                continue
            if not np.isfinite(loss):
                dump = self.model_path / f"snapshot_iter{iteration}.npz"
                ckpt.save_checkpoint(dump, prev_state, prev_opt,
                                     iteration, self.spatial_lr_scale)
                raise FloatingPointError(
                    f"non-finite loss at iteration {iteration}; "
                    f"pre-step state dumped to {dump}")
            self.state, self.opt_state = state, opt
            return _Verified(loss=loss, l1=l1, num_instances=int(ninst),
                             instance_overflow=False, n_alive=int(n_alive))

    def _host_local(self, tree):
        """Make a device pytree fully addressable on every process.

        In a multi-host run the post-step params/opt state live sharded
        over the global mesh; process 0 cannot ``np.asarray`` them
        directly. This gathers each leaf to host-local numpy via a
        collective that EVERY process must call — so call it outside any
        ``is_proc0`` guard, then gate only the file writes."""
        if jax.process_count() == 1:
            return tree
        from jax.experimental import multihost_utils
        return jax.tree.map(
            lambda x: multihost_utils.process_allgather(x, tiled=True)
            if isinstance(x, jax.Array) and not x.is_fully_addressable
            else x, tree,
            is_leaf=lambda x: isinstance(x, jax.Array))

    def flush_pending(self):
        """Verify the in-flight step now (used before any state
        mutation, logging, eval, or checkpointing)."""
        if self._pending is None:
            return self._last_verified
        p, self._pending = self._pending, None
        v = self._verify(p, refire=False)
        self._last_verified = v
        return v

    # -- the loop ----------------------------------------------------------
    def train(self, iterations=None, *, test_iterations=(7000, 30000),
              save_iterations=(30000,), checkpoint_iterations=(),
              start_checkpoint=None):
        opt_cfg = self.opt_cfg
        iterations = iterations or opt_cfg.iterations
        first_iter = 0
        if start_checkpoint:
            # a checkpoint from a long run can hold more Gaussians than
            # the fresh scene-derived capacity — size to fit with growth
            # headroom (reference restore keeps the saved tensor sizes)
            n_ck = int(np.load(start_checkpoint)["n_alive"])
            cap = max(self.state.capacity,
                      _round_up(max(n_ck * 5 // 3, 4096), 4096))
            if self.n_devices > 1:
                cap = _round_up(cap, self.n_devices)
            self.state, self.opt_state, first_iter, self.spatial_lr_scale = \
                ckpt.load_checkpoint(start_checkpoint, capacity=cap)
            self.log(f"[ckpt] resumed from {start_checkpoint} at iteration "
                     f"{first_iter}")

        opt_leaves = {
            "feature_lr": opt_cfg.feature_lr,
            "opacity_lr": opt_cfg.opacity_lr,
            "scaling_lr": opt_cfg.scaling_lr,
            "rotation_lr": opt_cfg.rotation_lr,
        }
        t_start = time.time()

        for iteration in range(first_iter + 1, iterations + 1):
            t_iter0 = time.time()
            self.iteration = iteration
            self._profile_tick(iteration)
            if self.viewer is not None:
                self.flush_pending()   # viewer renders committed state
                self._poll_viewer(iteration >= iterations)
            cam = self._next_camera()
            cam_arrays, gt = self._camera_bundle(cam)

            xyz_lr = schedules.xyz_lr_at(
                iteration, opt_cfg, self.spatial_lr_scale,
                ours_new=self.rain.ours_new,
                warmup_iter=self.rain.warmup_iter)
            sh_deg = schedules.sh_degree_at(
                iteration, self.model.sh_degree,
                ours=self.rain.ours or self.rain.ours_new)
            n_gauss = int(self.state.n_alive) if iteration == 1 or \
                iteration % int(self.rain.c2f_every_step) == 0 else 0
            self.low_pass = schedules.c2f_low_pass(
                iteration, c2f=self.rain.c2f,
                c2f_every_step=self.rain.c2f_every_step,
                c2f_max_lowpass=self.rain.c2f_max_lowpass,
                densify_until_iter=self.densify_until,
                height=cam.height, width=cam.width,
                num_gaussians=n_gauss or 1, prev=self.low_pass)

            bg = self.background
            if opt_cfg.random_background:          # train.py:94
                self._key, sub = jax.random.split(self._key)
                bg = jax.random.uniform(sub, (3,))

            in_densify = iteration < self.densify_until
            self._enqueue_step((cam, cam_arrays, gt, bg, self.low_pass,
                                xyz_lr, sh_deg, opt_leaves, in_densify))
            if self.tb is not None:   # train.py:183 (per-iteration timing)
                self.tb.add_scalar("iter_time",
                                   (time.time() - t_iter0) * 1000.0,
                                   iteration)

            # eval + PLY snapshot BEFORE densify/reset, like the
            # reference (training_report and scene.save at train.py:
            # 127-130 precede densify_and_prune/reset_opacity at
            # :136-143 — an eval landing on an opacity-reset iteration
            # must see the pre-reset model, or its PSNR craters)
            if iteration in test_iterations:
                self.flush_pending()
                self.report(iteration)
            # flush/gather run on EVERY process (flush can re-dispatch a
            # collective program on overflow; the gather IS a
            # collective) — only the file writes are proc-0-gated
            if iteration in save_iterations:
                self.flush_pending()
                state = self._host_local(self.state)
                if self.is_proc0:
                    path = (self.model_path / "point_cloud" /
                            f"iteration_{iteration}" / "point_cloud.ply")
                    ckpt.save_ply_snapshot(path, state)
                    self.log(f"[{iteration}] saved {path}")

            # densification cadence (train.py:132-143)
            if in_densify and iteration > opt_cfg.densify_from_iter and \
                    iteration % opt_cfg.densification_interval == 0:
                self.flush_pending()   # densify mutates verified state
                self._maybe_grow()
                use_size = iteration > opt_cfg.opacity_reset_interval
                abe = iteration <= self.rain.warmup_iter
                self._key, sub = jax.random.split(self._key)
                self.state, self.opt_state, info = \
                    densify_mod.densify_and_prune(
                        self.state, self.opt_state, sub,
                        max_grad=opt_cfg.densify_grad_threshold,
                        min_opacity=0.005,
                        extent=self.scene.nerf_radius,
                        percent_dense=opt_cfg.percent_dense,
                        divide_ratio=self.divide_ratio,
                        size_threshold=20.0,
                        use_size_threshold=use_size,
                        abe_split=abe)
                if bool(info.overflow):
                    self.log("[cap] densify overflow — growing next round")
                    self._maybe_grow(force=True)
            if in_densify and (
                    iteration % opt_cfg.opacity_reset_interval == 0 or
                    (self.model.white_background and
                     iteration == opt_cfg.densify_from_iter)):
                self.flush_pending()
                self.state, self.opt_state = densify_mod.reset_opacity(
                    self.state, self.opt_state)

            if iteration % self.system.log_every == 0 or \
                    iteration == iterations:
                aux = self.flush_pending()
                loss = aux.loss
                self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
                if self.tb is not None:
                    self.tb.add_scalar("train_loss_patches/l1_loss",
                                       aux.l1, iteration)
                    self.tb.add_scalar("train_loss_patches/total_loss",
                                       loss, iteration)
                    self.tb.add_scalar("total_points",
                                       aux.n_alive, iteration)
                if iteration % (self.system.log_every * 10) == 0 or \
                        iteration == iterations:
                    dt = time.time() - t_start
                    self.log(f"[{iteration}] loss {self.ema_loss:.5f} "
                             f"gaussians {aux.n_alive} "
                             f"it/s {iteration / max(dt, 1e-9):.2f}")

            if iteration in checkpoint_iterations:
                self.flush_pending()
                state, opt = self._host_local((self.state, self.opt_state))
                if self.is_proc0:
                    path = self.model_path / f"chkpnt{iteration}.npz"
                    ckpt.save_checkpoint(path, state, opt, iteration,
                                         self.spatial_lr_scale)
                    self.log(f"[{iteration}] checkpoint {path}")
        self.flush_pending()
        self._profile_tick(iterations + 1)   # close a still-open trace
        return self.state

    def _profile_tick(self, iteration: int):
        """Start/stop the jax.profiler trace for --profile_steps A-B
        (first-class profiling hook; the reference only logs per-iter
        wall time, train.py:47-48,183 — the TPU trace carries full
        per-op device timelines, viewable in TensorBoard / xprof and
        parseable with tools/profiling/xplane_parse.py)."""
        if self._profile_range is None:
            return
        a, b = self._profile_range
        if not self._profiling and a <= iteration <= b:
            path = self.model_path / "profile"
            path.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(path))
            self._profiling = True
            self.log(f"[profile] tracing iterations {iteration}..{b} "
                     f"-> {path}")
        elif self._profiling and iteration > b:
            jax.profiler.stop_trace()
            self._profiling = False
            self.log("[profile] trace complete")

    def _poll_viewer(self, training_done: bool):
        """Serve the SIBR viewer (reference train.py:56-69)."""
        import jax.numpy as jnp
        import numpy as np

        def render_fn(cam, scaling_modifier):
            from rain_tpu.train import step as step_mod
            camera = {k: (jnp.asarray(v) if not isinstance(v, int) else v)
                      for k, v in cam.items()}
            width, height = camera.pop("width"), camera.pop("height")
            out = step_mod.eval_render(
                self.state, camera, self.background,
                jnp.asarray(self.low_pass, jnp.float32),
                jnp.asarray(scaling_modifier or 1.0, jnp.float32),
                width=width, height=height,
                sh_degree=self.model.sh_degree,
                max_instances=self.max_instances)
            img = np.asarray(jnp.clip(out.render, 0.0, 1.0))
            return memoryview(
                (img * 255).astype(np.uint8).transpose(1, 2, 0).copy())

        self.viewer.handle(render_fn, str(self.model.source_path),
                           training_done)

    # -- evaluation (training_report, train.py:179-224) --------------------
    def report(self, iteration):
        from rain_tpu.eval.lpips import lpips_fn_or_none
        lpips_fn = lpips_fn_or_none(log_fn=self.log)
        configs = [("test", self.scene.test_cameras),
                   ("train", [self.scene.train_cameras[
                       i % len(self.scene.train_cameras)]
                       for i in range(5, 30, 5)])]
        results = {}
        first_report = not self.history
        for name, cams in configs:
            if not cams:
                continue
            psnrs, l1s, ssims, lpipss = [], [], [], []
            for idx, cam in enumerate(cams):
                cam_arrays, gt = self._camera_bundle(cam)
                if gt is None:
                    continue
                # bucketed training pads the cached GT; eval renders at
                # the exact camera size
                gt = gt[:, :cam.height, :cam.width]
                out = step_mod.eval_render(
                    self.state, cam_arrays, self.background,
                    jnp.asarray(self.low_pass, jnp.float32),
                    width=cam.width, height=cam.height,
                    sh_degree=self.model.sh_degree,
                    max_instances=self.max_instances)
                img = jnp.clip(out.render, 0.0, 1.0)
                gtc = jnp.clip(gt, 0.0, 1.0)
                if self.tb is not None and idx < 5:   # train.py:200-203
                    self.tb.add_images(f"{name}_view_{cam.image_name}/render",
                                       np.asarray(img)[None], iteration)
                    if first_report:
                        self.tb.add_images(
                            f"{name}_view_{cam.image_name}/ground_truth",
                            np.asarray(gtc)[None], iteration)
                psnrs.append(float(loss_ops.psnr(img, gtc)[0]))
                l1s.append(float(loss_ops.l1_loss(img, gtc)))
                ssims.append(float(loss_ops.ssim(img, gtc)))
                if lpips_fn is not None:
                    lpipss.append(float(lpips_fn(img, gtc)))
            if psnrs:
                results[name] = {"psnr": float(np.mean(psnrs)),
                                 "l1": float(np.mean(l1s)),
                                 "ssim": float(np.mean(ssims))}
                if lpipss:
                    results[name]["lpips"] = float(np.mean(lpipss))
                self.log(f"[ITER {iteration}] Evaluating {name}: "
                         f"L1 {results[name]['l1']:.5f} "
                         f"PSNR {results[name]['psnr']:.2f} "
                         f"SSIM {results[name]['ssim']:.4f}" +
                         (f" LPIPS(vgg) {results[name]['lpips']:.4f}"
                          if lpipss else ""))
                if self.tb is not None:
                    for k, v in results[name].items():
                        self.tb.add_scalar(
                            f"{name}/loss_viewpoint - {k}", v, iteration)
        if self.tb is not None:                       # train.py:218-221
            alive = np.asarray(gmod.alive_mask(self.state))
            opac = jax.nn.sigmoid(
                np.asarray(self.state.params.opacity[:, 0]))
            self.tb.add_histogram("scene/opacity_histogram",
                                  np.asarray(opac)[alive], iteration)
            self.tb.add_scalar("total_points", int(self.state.n_alive),
                               iteration)
        self.history.append({"iteration": iteration, **results})
        if self.is_proc0:
            (self.model_path / "log_file.txt").open("a").write(
                json.dumps({"iteration": iteration, **results}) + "\n")
        return results
