"""Fused sphere path-tracing kernel.

TPU-native rebuild of /root/reference/src/shaders/sphere_pathtracing.cs.glsl:
one Pallas program per scheduled 32x128 tile (the 32x32 GL workgroup analog,
glsl:5) runs the whole pipeline in VMEM:

  tile lookup (scalar-prefetch schedule)  <-  glsl:356-359
  per-pixel RNG                           <-  glsl:367 (threefry default)
  jittered primary ray                    <-  glsl:371-384
  masked bounce loop over 128 spheres     <-  glsl:272-317
  accumulate + gamma display              <-  glsl:391-395

Scene constants live in SMEM (the std430/bindless buffer analog,
glsl:56-57); the accumulation/output/RNG planes are HBM-resident and
block-aliased in/out so only scheduled tiles move HBM<->VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from l2n_tpu.ops.intersect import intersect_sphere_scene
from l2n_tpu.ops.kernels import register_kernel
from l2n_tpu.ops.kernels.common import (
    accumulate_and_tonemap,
    interpret_mode,
    make_kernel_sampler,
    tile_pixel_coords,
)
from l2n_tpu.ops.pathtrace import Hit, generate_rays, shade
from l2n_tpu.render.state import FrameState
from l2n_tpu.render.tiles import advance_offset, scheduled_tiles


def _kernel(cfg, n_spheres, sphere_unroll, *refs):
    if cfg.rng == "threefry":
        (sched_ref, cam_ref, cx_ref, cy_ref, cz_ref, r2_ref,
         accum_in, _out_in, accum_out, out_out) = refs
        rng_in = rng_out = None
    else:
        (sched_ref, cam_ref, cx_ref, cy_ref, cz_ref, r2_ref,
         accum_in, _out_in, rng_in, accum_out, out_out, rng_out) = refs

    i = pl.program_id(0)
    tile_x = sched_ref[i, 0]
    tile_y = sched_ref[i, 1]
    row, col = tile_pixel_coords(cfg, tile_x, tile_y)
    pixel_index = (col + row * jnp.int32(cfg.padded_width)).astype(jnp.uint32)
    # Mosaic lacks a direct f32->u32 cast; go through i32 (counts < 2^31).
    sample_index = accum_in[3].astype(jnp.int32).astype(jnp.uint32)

    sampler, finalize = make_kernel_sampler(cfg, pixel_index, sample_index,
                                            rng_in, rng_out)
    u1, u2 = sampler.draw2()  # pixel jitter (glsl:371)
    rays = generate_rays(cfg, cam_ref, col.astype(jnp.float32),
                         row.astype(jnp.float32), u1, u2)

    def fetch(s):
        return cx_ref[s], cy_ref[s], cz_ref[s], r2_ref[s]

    def intersect(ox, oy, oz, dx, dy, dz) -> Hit:
        t, px, py, pz, nx, ny, nz, idx, br2 = intersect_sphere_scene(
            ox, oy, oz, dx, dy, dz, n_spheres, fetch, unroll=sphere_unroll)
        return Hit(t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
                   index=idx, emis_r2=br2)

    r, g, b = shade(cfg, intersect, sampler, *rays,
                    skip_empty=cfg.skip_empty_tiles)
    accumulate_and_tonemap(cfg, accum_in, accum_out, out_out, r, g, b)
    finalize()


@register_kernel("sphere")
def build_sphere_step(cfg, scene, tile_array, sphere_unroll: int | None = None):
    # Mosaic only supports unroll == 1 or == trip count; fully unrolling the
    # sphere sweep measures ~1.4x faster (no loop/scalar-load overhead).
    if sphere_unroll is None:
        sphere_unroll = scene.count if scene.count <= 256 else 1
    th, tw = cfg.tile_height, cfg.tile_width
    hp, wp = cfg.padded_height, cfg.padded_width
    k = cfg.effective_tiles_per_step
    n = scene.count
    tile_array = jnp.asarray(tile_array)
    stateful = cfg.rng != "threefry"
    rng_planes = 8 if cfg.rng == "tinymt" else 4

    def tile_map(planes):
        # Block index of grid step i comes from the prefetched schedule:
        # (plane 0, tile_y, tile_x) — uTileArray[(i + offset) % T] was
        # resolved on the host side of the jit already.
        return pl.BlockSpec(
            (planes, th, tw),
            lambda i, sched: (0, sched[i, 1], sched[i, 0]),
            memory_space=pltpu.VMEM)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem(),                      # camera (10, 4)
                smem(), smem(), smem(), smem(),  # scene SoA (n,) each
                tile_map(4), tile_map(3)]    # accum, output
    out_specs = [tile_map(4), tile_map(3)]
    out_shape = [jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
                 jax.ShapeDtypeStruct((3, hp, wp), jnp.float32)]
    # Operand indices include the scalar-prefetch schedule (index 0).
    aliases = {6: 0, 7: 1}
    if stateful:
        in_specs.append(tile_map(rng_planes))
        out_specs.append(tile_map(rng_planes))
        out_shape.append(jax.ShapeDtypeStruct((rng_planes, hp, wp), jnp.uint32))
        aliases[8] = 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=in_specs,
        out_specs=out_specs,
    )

    call = pl.pallas_call(
        partial(_kernel, cfg, n, sphere_unroll),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret_mode(),
    )

    cx, cy, cz, r2 = (scene.center_x, scene.center_y, scene.center_z,
                      scene.sqr_radius)

    def step(state: FrameState, camera) -> FrameState:
        sched = scheduled_tiles(tile_array, state.tile_offset, k)
        args = [sched, jnp.asarray(camera, jnp.float32), cx, cy, cz, r2,
                state.accum, state.output]
        if stateful:
            args.append(state.rng_state)
        outs = call(*args)
        return FrameState(
            accum=outs[0],
            output=outs[1],
            tile_offset=advance_offset(cfg, state.tile_offset),
            iteration=state.iteration + 1,
            rng_state=outs[2] if stateful else None,
        )

    return step
