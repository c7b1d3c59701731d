"""Bounce-sweep candidate-union density for the headline sphere scene.

VERDICT r3 asked whether a per-tile bounce-origin bound could cull the
128-candidate bounce sweep the way the cone table culls primaries
(`/root/reference/src/shaders/sphere_pathtracing.cs.glsl:185-197` is the
hot loop). Any block-level cull — origin boxes, bound tables, work
lists — can at best skip candidates that NO lane of a (32, 128) lane
block needs. This script measures that ceiling directly on the headline
config: for each tile's first-bounce rays it computes, per candidate
sphere, whether ANY lane's ray enters the sphere's bound, and reports
the per-block union density. A union density near 1.0 means the
lockstep bounce sweep is irreducible at block granularity: every
candidate must be swept for almost every block, and the only remaining
lever is per-candidate cost (measured at the VPU issue bound,
benchmarks/PROFILE.md).

Run: python benchmarks/bounce_union.py   (TPU or CPU; pure XLA, no Pallas)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from l2n_tpu.camera import Camera
    from l2n_tpu.config import RenderConfig
    from l2n_tpu.maths.sampling import (
        cosine_sample_hemisphere,
        frame_z,
        local_to_world,
    )
    from l2n_tpu.ops.pathtrace import generate_rays
    from l2n_tpu.render.step import make_intersector
    from l2n_tpu.rng.sampler import ThreefrySampler, max_pairs_per_sample
    from l2n_tpu.scene import compute_spheres

    cfg = RenderConfig(width=1024, height=1024, tile_height=32,
                       tile_width=128, tiles_per_step=1024).validate()
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    camera = Camera.from_config(cfg)
    intersect, _, _, _ = make_intersector(cfg, scene)

    th, tw = cfg.tile_height, cfg.tile_width
    ty, tx = np.meshgrid(np.arange(cfg.height // th),
                         np.arange(cfg.width // tw), indexing="ij")
    tiles = np.stack([tx.ravel(), ty.ravel()], 1)

    cx = jnp.asarray(scene.center_x)
    cy = jnp.asarray(scene.center_y)
    cz = jnp.asarray(scene.center_z)
    r2 = jnp.asarray(scene.sqr_radius)

    @jax.jit
    def block_stats(tile_x, tile_y):
        py, px = jnp.meshgrid(jnp.arange(th, dtype=jnp.int32) + tile_y * th,
                              jnp.arange(tw, dtype=jnp.int32) + tile_x * tw,
                              indexing="ij")
        pixel_index = (px + py * jnp.int32(cfg.padded_width)).astype(
            jnp.uint32)
        sampler = ThreefrySampler(cfg.seed, 0, pixel_index,
                                  jnp.zeros((th, tw), jnp.uint32),
                                  max_pairs_per_sample(cfg.max_bounces))
        u1, u2 = sampler.draw2()
        ox, oy, oz, dx, dy, dz = generate_rays(
            cfg, jnp.asarray(camera.packed()), px.astype(jnp.float32),
            py.astype(jnp.float32), u1, u2)
        hit = intersect(ox, oy, oz, dx, dy, dz)
        alive = hit.t >= 0.0
        # First-bounce ray: cosine sample about the shading normal — the
        # same scatter the kernel performs (pathtrace.py).
        u3, u4 = sampler.draw2()
        tangent, bitangent = frame_z(hit.nx, hit.ny, hit.nz)
        (lx, ly, lz), _jac = cosine_sample_hemisphere(u3, u4)
        bdx, bdy, bdz = local_to_world(lx, ly, lz, tangent, bitangent,
                                       (hit.nx, hit.ny, hit.nz))
        eps = jnp.float32(1e-2)
        box = hit.px + eps * bdx
        boy = hit.py + eps * bdy
        boz = hit.pz + eps * bdz

        def enter_any(s, acc):
            rox, roy, roz = box - cx[s], boy - cy[s], boz - cz[s]
            hb = rox * bdx + roy * bdy + roz * bdz
            c = rox * rox + roy * roy + roz * roz - r2[s]
            enter = alive & ((c < 0.0) | ((hb < 0.0) & (hb * hb - c >= 0.0)))
            n_lanes = enter.sum()
            return acc.at[s, 0].set((n_lanes > 0).astype(jnp.int32)).at[
                s, 1].set(n_lanes.astype(jnp.int32))

        acc = jax.lax.fori_loop(
            0, cfg.sphere_count, enter_any,
            jnp.zeros((cfg.sphere_count, 2), jnp.int32))
        return acc[:, 0].sum(), acc[:, 1].sum(), alive.sum()

    union = []
    per_lane = []
    alive_tot = 0
    for t in tiles:
        u, lane_enters, n_alive = block_stats(int(t[0]), int(t[1]))
        if int(n_alive) == 0:
            continue  # pure-sky tile: no bounce sweep at all (skip_empty)
        union.append(int(u))
        per_lane.append(int(lane_enters) / max(1, int(n_alive)))
        alive_tot += int(n_alive)

    union = np.asarray(union, np.float64)
    per_lane = np.asarray(per_lane, np.float64)
    n = cfg.sphere_count
    print(f"blocks with alive bounce lanes: {len(union)}/{len(tiles)}")
    print(f"per-block candidate-union density: mean "
          f"{union.mean() / n:.3f}, p10 {np.percentile(union, 10) / n:.3f}, "
          f"min {union.min() / n:.3f} (of {n} spheres)")
    print(f"per-LANE mean bounds entered: {per_lane.mean():.2f} of {n} "
          f"(the divergence a per-lane walk could exploit; lockstep pays "
          f"the union)")


if __name__ == "__main__":
    sys.exit(main())
