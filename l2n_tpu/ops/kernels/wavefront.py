"""Wavefront sphere path tracing: compacted bounce continuation.

The fused single-pass kernel (sphere_pt.py) pays the full 128-candidate
bounce sweep on every tile with ANY alive lane, yet only ~20% of lanes
survive the first vertex at the reference workload (mean 1.22 segments per
sample — the SIMT `while` at sphere_pathtracing.cs.glsl:280 simply retires
dead threads; lockstep lanes cannot). This module restructures the step as
a wavefront (the classic formulation of Laine/Karras/Aila, "Megakernels
Considered Harmful", HPG 2013), in TPU-native form:

  pass A  (Pallas, grid = scheduled tiles): RNG, jittered primary ray,
          cone-culled primary sweep, first-vertex resolve (emissive + sky),
          b=0 scatter + Russian roulette -> per-lane continuation-ray planes
          + partial radiance. No bounce sweeps.
  compact (XLA): alive-flag cumsum -> full rank permutation; one gather
          brings survivor rays to a dense prefix. O(planes) HBM traffic,
          no sort.
  pass B  (Pallas, grid = lane blocks): full bounce continuation
          (trace_wavefront_continue) on DENSE blocks only — blocks past the
          alive count exit via pl.when before touching the scene.
  pass C  (Pallas, grid = scheduled tiles): pass A radiance + scattered-back
          pass B contributions -> accumulate + tonemap (glsl:391-395).

Radiance math is bit-identical to the single-pass kernel: both compose the
same _scatter_and_roulette/_finish_path helpers (ops.pathtrace), and the
counter-based threefry stream resumes in pass B at the exact static draw
position where pass A stopped (ThreefrySampler.resumed).

MEASURED OUTCOME (v5e, 1024x1024 reference workload): the wavefront step is
~26x SLOWER than the fused single-pass kernel, because the XLA compaction
glue between the passes — cumsum + two lane-granularity gathers over ~4M
lanes x 10 planes — runs at roughly one element per cycle on the TPU vector
unit (there is no cross-lane shuffle hardware; a sort-based variant was
separately measured at tens of seconds). Survivors also cluster spatially
(row-granularity occupancy 52% vs tile-granularity 58%), so coarse-block
compaction cannot recover the loss either. The module is kept as the
honest, tested resolution of the compaction question (off by default,
`RenderConfig.wavefront`): on this hardware the dense masked bounce loop
with `skip_empty_tiles` is the right design, and the reference's SIMT
thread-retirement trick has no profitable TPU analog at this scene scale.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from l2n_tpu.camera.camera import ROW_PROJ
from l2n_tpu.ops.intersect import intersect_sphere_scene, sphere_scene_anyhit
from l2n_tpu.ops.kernels.common import (
    TpuHwSampler,
    accumulate_and_tonemap,
    interpret_mode,
    make_kernel_sampler,
    seed_tpu_hw,
    tile_pixel_coords,
)
from l2n_tpu.ops.kernels.sphere_pt import (
    _culled_sweep,
    full_visibility_table,
    order_cap,
)
from l2n_tpu.ops.pathtrace import (
    WAVEFRONT_FAR_THRESHOLD,
    Hit,
    generate_rays,
    trace_wavefront_continue,
    trace_wavefront_primary,
    wavefront_draw_position,
)
from l2n_tpu.render.state import FrameState
from l2n_tpu.render.tiles import advance_offset, scheduled_tiles
from l2n_tpu.rng.sampler import ThreefrySampler, max_pairs_per_sample


def _ray_plane_count(cfg) -> int:
    """cast origin (3) + direction (3) + throughput (3) [+ BSDF pdf under
    MIS]. The alive flag costs no plane: alive <=> cast_ox < 1e30."""
    return 10 if (cfg.nee and cfg.mis) else 9


def _scene_closures(cfg, n_spheres, sphere_unroll, fetch,
                    outside_ok=False):
    def intersect(ox, oy, oz, dx, dy, dz) -> Hit:
        t, px, py, pz, nx, ny, nz, idx, br2 = intersect_sphere_scene(
            ox, oy, oz, dx, dy, dz, n_spheres, fetch, unroll=sphere_unroll,
            assume_outside=outside_ok, fast_math=cfg.fast_math)
        return Hit(t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
                   index=idx, emis_r2=br2)

    def anyhit(ox, oy, oz, dx, dy, dz):
        return sphere_scene_anyhit(ox, oy, oz, dx, dy, dz, n_spheres, fetch,
                                   unroll=sphere_unroll,
                                   assume_outside=outside_ok)

    light_sampler = None
    if cfg.nee:
        from l2n_tpu.ops.nee import make_sphere_light_sampler
        light_sampler = make_sphere_light_sampler(
            n_spheres, cfg.emissive_every, fetch)
    return intersect, anyhit, light_sampler


# ---------------------------------------------------------------------------
# Pass A — primary + first scatter, one program per scheduled tile
# ---------------------------------------------------------------------------

def _pass_a_kernel(cfg, n_spheres, sphere_unroll, cone_cull, outside_ok, *refs):
    threefry = cfg.rng == "threefry"
    if threefry:
        (sched_ref, vis_ref, samp_ref, cam_ref, cx_ref, cy_ref, cz_ref,
         r2_ref, rays_out, col_out, meta_out) = refs
    else:
        (sched_ref, vis_ref, samp_ref, cam_ref, cx_ref, cy_ref, cz_ref,
         r2_ref, rays_out, col_out) = refs

    f32 = jnp.float32
    th = cfg.tile_height
    i = pl.program_id(0)
    tile_x = sched_ref[i, 0]
    tile_y = sched_ref[i, 1]
    row_offset = cam_ref[ROW_PROJ, 2].astype(jnp.int32)
    stream = cam_ref[ROW_PROJ, 3].astype(jnp.int32).astype(jnp.uint32)
    row, col = tile_pixel_coords(cfg, tile_x, tile_y)
    row = row + row_offset
    pixel_index = (col + row * jnp.int32(cfg.padded_width)).astype(jnp.uint32)
    sample_index = samp_ref[i].astype(jnp.uint32)

    def fetch(s):
        return cx_ref[s], cy_ref[s], cz_ref[s], r2_ref[s]

    intersect, _anyhit, light_sampler = _scene_closures(
        cfg, n_spheres, sphere_unroll, fetch, outside_ok=outside_ok)

    if cone_cull:
        tid = tile_y * jnp.int32(cfg.tile_count_x) + tile_x
        n_vis = vis_ref[tid, 0]

        def intersect_primary(ox, oy, oz, dx, dy, dz) -> Hit:
            return _culled_sweep(n_spheres, fetch,
                                 lambda k: vis_ref[tid, 1 + k], n_vis,
                                 ox, oy, oz, dx, dy, dz,
                                 fast_math=cfg.fast_math)
    else:
        # The camera is not covered by the disjointness argument (it can sit
        # inside a sphere, where the reference returns the t2 exit root) —
        # the un-culled primary keeps the full sweep with assume_outside
        # off, mirroring the single-pass kernel (sphere_pt.py).
        def intersect_primary(ox, oy, oz, dx, dy, dz) -> Hit:
            t, px, py, pz, nx, ny, nz, idx, br2 = intersect_sphere_scene(
                ox, oy, oz, dx, dy, dz, n_spheres, fetch,
                unroll=sphere_unroll, assume_outside=False,
                fast_math=cfg.fast_math)
            return Hit(t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
                       index=idx, emis_r2=br2)

    for s in range(cfg.spp_per_step):
        sampler, _ = make_kernel_sampler(
            cfg, pixel_index, sample_index + jnp.uint32(s), None, None,
            stream=stream)
        u1, u2 = sampler.draw2()  # pixel jitter (glsl:371)
        rays = generate_rays(cfg, cam_ref, col.astype(f32), row.astype(f32),
                             u1, u2)
        out = trace_wavefront_primary(
            cfg, intersect, sampler, *rays,
            intersect_primary=intersect_primary,
            light_sampler=light_sampler)
        (cr, cg, cb, cox, coy, coz, bdx, bdy, bdz,
         tpr, tpg, tpb, ppdf) = out
        sl = slice(s * th, (s + 1) * th)
        col_out[0, 0, sl, :] = cr
        col_out[1, 0, sl, :] = cg
        col_out[2, 0, sl, :] = cb
        planes = (cox, coy, coz, bdx, bdy, bdz, tpr, tpg, tpb)
        if cfg.nee and cfg.mis:
            planes = planes + (ppdf,)
        for p, v in enumerate(planes):
            rays_out[p, 0, sl, :] = v
        if threefry:
            meta_out[0, 0, sl, :] = pixel_index
            meta_out[1, 0, sl, :] = jnp.broadcast_to(
                sample_index + jnp.uint32(s), pixel_index.shape)


# ---------------------------------------------------------------------------
# Pass B — bounce continuation over compacted survivor blocks
# ---------------------------------------------------------------------------

def _pass_b_kernel(cfg, n_spheres, sphere_unroll, next_pair, has_spare,
                   block_shape, outside_ok, *refs):
    threefry = cfg.rng == "threefry"
    if threefry:
        (nalive_ref, cam_ref, cx_ref, cy_ref, cz_ref, r2_ref,
         rays_ref, meta_ref, out_ref) = refs
    else:
        (nalive_ref, cam_ref, cx_ref, cy_ref, cz_ref, r2_ref,
         rays_ref, out_ref) = refs

    i = pl.program_id(0)
    lanes = block_shape[0] * block_shape[1]
    start = i * jnp.int32(lanes)

    @pl.when(start < nalive_ref[0])
    def _run():
        def fetch(s):
            return cx_ref[s], cy_ref[s], cz_ref[s], r2_ref[s]

        intersect, anyhit, light_sampler = _scene_closures(
            cfg, n_spheres, sphere_unroll, fetch, outside_ok=outside_ok)
        stream = cam_ref[ROW_PROJ, 3].astype(jnp.int32).astype(jnp.uint32)

        if threefry:
            sampler = ThreefrySampler.resumed(
                cfg.seed, stream, meta_ref[0, 0], meta_ref[1, 0],
                max_pairs_per_sample(cfg.max_bounces, cfg.nee),
                next_pair, has_spare)
        else:  # tpu_hw — fresh hardware stream, decorrelated from pass A
            # Mix the step's minimum sample index (scalar-prefetched) into
            # the seed: without it a static camera re-drew the identical
            # pass-B sequence every accumulation step, correlating bounce/RR
            # draws across samples (ADVICE r2).
            seed_tpu_hw(cfg, jnp.int32(0x5B17) + nalive_ref[1],
                        stream ^ jnp.uint32(0x40000000))
            sampler = TpuHwSampler(block_shape)

        (cox, coy, coz, bdx, bdy, bdz, tpr, tpg, tpb) = (
            rays_ref[p, 0] for p in range(9))
        ppdf = rays_ref[9, 0] if (cfg.nee and cfg.mis) else None
        cr, cg, cb = trace_wavefront_continue(
            cfg, intersect, sampler, cox, coy, coz, bdx, bdy, bdz,
            tpr, tpg, tpb, prev_pdf=ppdf, intersect_anyhit=anyhit,
            light_sampler=light_sampler)
        out_ref[0, 0] = cr
        out_ref[1, 0] = cg
        out_ref[2, 0] = cb


# ---------------------------------------------------------------------------
# Pass C — accumulate + tonemap per scheduled tile
# ---------------------------------------------------------------------------

def _pass_c_kernel(cfg, *refs):
    (sched_ref, col_ref, contrib_ref, accum_in, _out_in,
     accum_out, out_out) = refs
    th = cfg.tile_height
    tw = cfg.tile_width
    sum_r = jnp.zeros((th, tw), jnp.float32)
    sum_g = jnp.zeros((th, tw), jnp.float32)
    sum_b = jnp.zeros((th, tw), jnp.float32)
    for s in range(cfg.spp_per_step):
        sl = slice(s * th, (s + 1) * th)
        sum_r = sum_r + col_ref[0, 0, sl, :] + contrib_ref[0, 0, sl, :]
        sum_g = sum_g + col_ref[1, 0, sl, :] + contrib_ref[1, 0, sl, :]
        sum_b = sum_b + col_ref[2, 0, sl, :] + contrib_ref[2, 0, sl, :]
    accumulate_and_tonemap(cfg, accum_in, accum_out, out_out,
                           sum_r, sum_g, sum_b, spp=cfg.spp_per_step)


# ---------------------------------------------------------------------------
# The step builder
# ---------------------------------------------------------------------------

def build_sphere_wavefront_step(cfg, scene, tile_array,
                                sphere_unroll: int | None = None,
                                cone_cull: bool = True, donate: bool = True,
                                steps_per_call: int = 1):
    """Returns step(FrameState, packed_camera) -> FrameState (jitted), with
    the same host-side per-camera visibility-table cache as the single-pass
    builder (sphere_pt.build_sphere_step)."""
    if cfg.rng not in ("threefry", "tpu_hw"):
        raise ValueError("wavefront requires a stateless sampler "
                         "(threefry or tpu_hw); stateful per-pixel streams "
                         "cannot resume across the compaction boundary")
    if sphere_unroll is None:
        sphere_unroll = scene.count if scene.count <= 256 else 1
    th, tw = cfg.tile_height, cfg.tile_width
    hp, wp = cfg.padded_height, cfg.padded_width
    k = cfg.effective_tiles_per_step
    spp = cfg.spp_per_step
    n = scene.count
    threefry = cfg.rng == "threefry"
    n_planes = _ray_plane_count(cfg)
    lanes_per_tile = spp * th * tw
    n_lanes = k * lanes_per_tile
    # Pass B lane block: sized so the unrolled scene sweep's live ranges fit
    # the 16 MB scoped-VMEM budget (a (128,128) block compiled to 22 MB).
    bh, bw = 64, tw
    while n_lanes % (bh * bw):  # tiny test configs
        bh //= 2
    nb = n_lanes // (bh * bw)
    tile_array = jnp.asarray(tile_array)
    cx, cy, cz, r2 = (scene.center_x, scene.center_y, scene.center_z,
                      scene.sqr_radius)

    if threefry:
        # Static draw-stream resume point for pass B (abstract trace of
        # pass A's draw pattern; counter-based draws are addressed).
        from l2n_tpu.render.step import make_intersector
        oracle_intersect, _, oracle_lights, _ = make_intersector(cfg, scene)
        next_pair, has_spare = wavefront_draw_position(
            cfg, oracle_intersect, light_sampler=oracle_lights)
    else:
        next_pair, has_spare = 0, False

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    def lane_map(planes, nprefetch):
        # (planes, K, spp*th, tw) lane arrays: block = one tile's lanes.
        index = {
            1: lambda i, a: (0, i, 0, 0),
            3: lambda i, a, b, c: (0, i, 0, 0),
        }[nprefetch]
        return pl.BlockSpec((planes, 1, spp * th, tw), index,
                            memory_space=pltpu.VMEM)

    def tile_map(planes):
        return pl.BlockSpec(
            (planes, th, tw),
            lambda i, sched: (0, sched[i, 1], sched[i, 0]),
            memory_space=pltpu.VMEM)

    # ---- pass A ----
    a_in = [smem()] * 5                           # camera + scene SoA (4)
    a_out_specs = [lane_map(n_planes, 3), lane_map(3, 3)]
    a_out_shape = [
        jax.ShapeDtypeStruct((n_planes, k, spp * th, tw), jnp.float32),
        jax.ShapeDtypeStruct((3, k, spp * th, tw), jnp.float32),
    ]
    if threefry:
        a_out_specs.append(lane_map(2, 3))
        a_out_shape.append(
            jax.ShapeDtypeStruct((2, k, spp * th, tw), jnp.uint32))
    # Same disjoint-scene sweep specialization as the single-pass kernel
    # (sphere_pt) so the two render paths stay op-for-op comparable.
    from l2n_tpu.scene.spheres import spheres_disjoint
    outside_ok = spheres_disjoint(scene, margin=2.0 * cfg.ray_epsilon)

    pass_a = pl.pallas_call(
        partial(_pass_a_kernel, cfg, n, sphere_unroll, cone_cull,
                outside_ok),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # schedule, vis table, sample indices
            grid=(k,), in_specs=a_in, out_specs=a_out_specs),
        out_shape=a_out_shape,
        interpret=interpret_mode(),
    )

    # ---- pass B ----
    def block_map(planes):
        return pl.BlockSpec((planes, 1, bh, bw),
                            lambda i, nalive: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    b_in = [smem(), smem(), smem(), smem(), smem(), block_map(n_planes)]
    if threefry:
        b_in.append(block_map(2))
    pass_b = pl.pallas_call(
        partial(_pass_b_kernel, cfg, n, sphere_unroll, next_pair, has_spare,
                (bh, bw), outside_ok),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # alive count
            grid=(nb,), in_specs=b_in, out_specs=[block_map(3)]),
        out_shape=[jax.ShapeDtypeStruct((3, nb, bh, bw), jnp.float32)],
        interpret=interpret_mode(),
    )

    # ---- pass C ----
    pass_c = pl.pallas_call(
        partial(_pass_c_kernel, cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # schedule
            grid=(k,),
            in_specs=[lane_map(3, 1), lane_map(3, 1),
                      tile_map(4), tile_map(3)],
            out_specs=[tile_map(4), tile_map(3)]),
        out_shape=[jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((3, hp, wp), jnp.float32)],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret_mode(),
    )

    table_fn = jax.jit(partial(full_visibility_table, cfg, scene))
    empty_table = None if cone_cull else jnp.zeros(
        (cfg.tile_count, 1 + order_cap(n)), jnp.int32)

    def kernel_step(state: FrameState, camera, table) -> FrameState:
        i32 = jnp.int32
        sched = scheduled_tiles(tile_array, state.tile_offset, k)
        # Per-tile sample counts, read once per tile (counts are uniform
        # within a tile: whole tiles are scheduled and cleared).
        samp = state.accum[3, sched[:, 1] * i32(th),
                           sched[:, 0] * i32(tw)].astype(i32)
        outs = pass_a(sched, table, samp, camera, cx, cy, cz, r2)
        rays, col_a = outs[0], outs[1]
        raysf = rays.reshape(n_planes, n_lanes)

        # Rank permutation: alive lanes -> dense prefix, dead lanes -> tail,
        # both in stable lane order. perm[i] is lane i's destination.
        alive = raysf[0] < jnp.float32(WAVEFRONT_FAR_THRESHOLD)
        csum = jnp.cumsum(alive.astype(i32))
        n_alive = csum[-1:]
        iota = jnp.arange(n_lanes, dtype=i32)
        perm = jnp.where(alive, csum - 1, n_alive[0] + iota - (csum - 1) - 1)
        inv = jnp.zeros((n_lanes,), i32).at[perm].set(iota,
                                                      unique_indices=True)
        comp = raysf[:, inv].reshape(n_planes, nb, bh, bw)
        # Scalar block for pass B: [alive count, min sample index] — the
        # second entry varies per accumulation step and decorrelates the
        # tpu_hw seed across steps (see _pass_b_kernel).
        b_scalars = jnp.concatenate([n_alive, samp.min()[None]])
        args = [b_scalars, camera, cx, cy, cz, r2, comp]
        if threefry:
            meta = outs[2].reshape(2, n_lanes)
            args.append(meta[:, inv].reshape(2, nb, bh, bw))
        contrib = pass_b(*args)[0]

        # Scatter-back: lane i's contribution sits at perm[i]; dead lanes
        # point past n_alive where pass B never wrote (garbage) — mask.
        back = contrib.reshape(3, n_lanes)[:, perm]
        back = jnp.where(alive[None], back, jnp.float32(0.0))
        back = back.reshape(3, k, spp * th, tw)
        accum, output = pass_c(sched, col_a, back, state.accum, state.output)
        return FrameState(
            accum=accum,
            output=output,
            tile_offset=advance_offset(cfg, state.tile_offset),
            iteration=state.iteration + 1,
            rng_state=None,
        )

    if steps_per_call > 1:
        single = kernel_step

        def kernel_step(state, camera, table):
            return jax.lax.fori_loop(
                0, steps_per_call, lambda _, st: single(st, camera, table),
                state)

    jit_step = jax.jit(kernel_step, donate_argnums=(0,) if donate else ())
    cache: dict[bytes, tuple] = {}

    def step(state: FrameState, camera) -> FrameState:
        camera = np.asarray(camera, np.float32)
        key = camera.tobytes()
        entry = cache.get(key)
        if entry is None:
            cache.clear()  # one live camera at a time
            cam_dev = jnp.asarray(camera)
            table = table_fn(cam_dev) if cone_cull else empty_table
            entry = (cam_dev, table)
            cache[key] = entry
        return jit_step(state, *entry)

    return step
