"""Experiment: isolate per-chunk cost drivers in the forward compositor.

Variants of the fwd kernel, each timed at garden-proxy scale:
  base     — current kernel
  nocond   — without the all-dead lax.cond skip
  noscan   — cumprod scan replaced by om (wrong math; perf probe)
  hi       — matmuls at Precision.HIGH (3 bf16 passes instead of 6)
  default  — matmuls at default precision (1 bf16 pass)
  noncontrib — without the n_contrib bookkeeping
"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from rain_tpu.cache import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from rain_tpu.data.cameras import Camera
from rain_tpu.model import gaussians as gmod
from rain_tpu.ops import projection as proj_ops
from rain_tpu.ops import binning as binning_ops
from rain_tpu.ops import tile_render
from rain_tpu.ops.tile_render import (_chunk_alpha, _cumprod_lanes, _pixquad,
                                      CHUNK, P, T_EPS, _f32, _compiler_params)
from rain_tpu.ops.sh import rgb_to_sh_dc

width, height = 1297, 840
n = 262_144
max_instances = 2_097_152
rng = np.random.default_rng(0)
pts = np.concatenate([rng.uniform(-3, 3, (n, 2)),
                      rng.uniform(2.0, 12.0, (n, 1))], axis=1).astype(np.float32)
cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
state = gmod.from_arrays(
    xyz=pts, f_dc=rgb_to_sh_dc(cols)[:, None, :],
    f_rest=np.zeros((n, 15, 3), np.float32),
    scaling=np.full((n, 3), -4.5, np.float32),
    rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
    opacity=np.full((n, 1), -1.0, np.float32), capacity=n)
cam = Camera(uid=0, image_name="bench", R=np.eye(3), T=np.zeros(3),
             fovx=1.0, fovy=0.7, image=None, width=width, height=height)
camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
alive = gmod.alive_mask(state)
scales, quats, opac, shs = gmod.activate(state.params)
grid_x = (width + 15) // 16
grid_y = (height + 15) // 16

prep = jax.jit(lambda: proj_ops.preprocess(
    state.params.xyz, scales, quats, opac, shs, alive, sh_degree=3,
    world_view=camera["world_view"], full_proj=camera["full_proj"],
    camera_center=camera["camera_center"],
    tan_fovx=camera["tanfovx"], tan_fovy=camera["tanfovy"],
    width=width, height=height, low_pass=0.3))()
binn = jax.jit(lambda: binning_ops.bin_gaussians(
    prep, grid_x, grid_y, max_instances))()
pergauss = jnp.concatenate([
    prep.xy, prep.conic, prep.opacity[:, None], prep.rgb,
    prep.depth[:, None]], axis=1)
pergauss = jnp.concatenate([pergauss, jnp.zeros_like(pergauss[:1])], axis=0)
inst = pergauss[binn.gauss_idx]
tid = jnp.minimum(binn.tile_id, grid_x * grid_y - 1)
origin = jnp.stack([tid % grid_x * 16, tid // grid_x * 16],
                   axis=-1).astype(jnp.float32)
xy_local = inst[:, 0:2] - origin
pack = tile_render._pack_padded(xy_local, inst[:, 2:5], inst[:, 5],
                                inst[:, 6:9], inst[:, 9])
starts, ends = binn.tile_start, binn.tile_end
pack = jax.block_until_ready(pack)


def make_fwd_kernel(*, cond=True, scan=True, prec="highest", ncontrib=True):
    PREC = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[prec]

    def kern(starts_ref, ends_ref, pack_hbm, pixquad_ref, out_ref,
             buf, sem, acc_ref):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = ends_ref[t]
        a_start = (start // CHUNK) * CHUNK
        nchunks = (end - a_start + CHUNK - 1) // CHUNK

        def dma(slot, c):
            off = pl.multiple_of(a_start + c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                pack_hbm.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot])

        @pl.when(nchunks > 0)
        def _():
            dma(0, 0).start()

        acc_ref[:] = jnp.zeros((P, 8), _f32)
        pixquad = pixquad_ref[:]

        def body(c, carry):
            t_vec, nc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < nchunks)
            def _():
                dma(jax.lax.rem(c + 1, 2), c + 1).start()

            dma(slot, c).wait()

            def compute(carry):
                t_vec, nc = carry
                pack_c = buf[slot]
                power = jnp.dot(pixquad, pack_c[0:8, :],
                                preferred_element_type=_f32, precision=PREC)
                op = pack_c[6:7, :]
                G = jnp.exp(power)
                alpha = jnp.minimum(op * G, 0.99)
                lane = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
                gidx = a_start + c * CHUNK + lane
                valid = (gidx >= start) & (gidx < end)
                alpha = jnp.where((power > 0.0) | (alpha < 1.0 / 255.0)
                                  | ~valid, 0.0, alpha)
                om = 1.0 - alpha
                if scan:
                    cum = _cumprod_lanes(om)
                else:
                    cum = om
                t_after = t_vec * cum
                m = t_after >= T_EPS
                w = jnp.where(m, alpha * t_after / om, 0.0)
                acc_ref[:] += jax.lax.dot_general(
                    w, pack_c[8:16, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=_f32, precision=PREC)
                t_new = jnp.min(jnp.where(m, t_after, t_vec), axis=1,
                                keepdims=True)
                if ncontrib:
                    pos = jnp.where(w > 0.0,
                                    (gidx - start + 1).astype(_f32), 0.0)
                    nc_new = jnp.maximum(nc, jnp.max(pos, axis=1,
                                                     keepdims=True))
                else:
                    nc_new = nc
                return (t_new, nc_new)

            if cond:
                return jax.lax.cond(jnp.all(t_vec < T_EPS),
                                    lambda cr: cr, compute, (t_vec, nc))
            return compute((t_vec, nc))

        init = (jnp.ones((P, 1), _f32), jnp.zeros((P, 1), _f32))
        t_vec, nc = jax.lax.fori_loop(0, nchunks, body, init)
        acc = acc_ref[:]
        out_ref[0] = jnp.concatenate(
            [acc[:, 0:5], t_vec, nc, jnp.zeros((P, 1), _f32)], axis=1)

    return kern


def build(**kw):
    kern = make_fwd_kernel(**kw)

    @jax.jit
    def run(pack, starts, ends):
        n_tiles = starts.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, 16, CHUNK), _f32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.VMEM((P, 8), _f32)],
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, P, 8), _f32),
            compiler_params=_compiler_params(),
        )(starts, ends, pack, jnp.asarray(_pixquad()))
    return run


def timeit(name, fn, reps=10):
    out = fn(pack, starts, ends)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(pack, starts, ends)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1000:8.2f} ms", flush=True)
    return out


base = timeit("base", build())
timeit("nocond", build(cond=False))
timeit("noscan", build(scan=False))
pass
timeit("prec=default", build(prec="default"))
timeit("noncontrib", build(ncontrib=False))
pass
ref = build()(pack, starts, ends)
hi = build(prec="default")(pack, starts, ends)
print("default-vs-highest max abs diff:",
      float(jnp.max(jnp.abs(ref[..., :6] - hi[..., :6]))))
