#!/usr/bin/env python
"""Ablation timings for the fused sphere kernel (run on the real chip).

Each variant rebuilds the kernel with one knob changed and reports
best-of-N ms/step, isolating where the step time goes (RNG, env light,
bounce sweeps, per-tile fixed costs, the skip-empty branches). Usage:

    python benchmarks/ablate.py [variant ...]   # default: all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from l2n_tpu.camera import Camera
from l2n_tpu.config import RenderConfig
from l2n_tpu.ops.kernels.sphere_pt import build_sphere_step
from l2n_tpu.render.state import init_frame_state
from l2n_tpu.render.tiles import tile_grid
from l2n_tpu.scene import compute_spheres


BASE = RenderConfig(width=1024, height=1024, tile_height=32, tile_width=128,
                    tiles_per_step=256, spp_per_step=4)

VARIANTS: dict[str, dict] = {
    "base": {},
    "spp1": {"spp_per_step": 1},
    "spp8": {"spp_per_step": 8},
    "env_none": {"env_mode": "none"},
    "no_skip_empty": {"skip_empty_tiles": False},
    "no_cone_cull": {"_cone_cull": False},
    "bounces1": {"max_bounces": 1},
    "bounces4": {"max_bounces": 4},
    "aov_normal": {"aov": "normal"},
    "aov_hit": {"aov": "hit"},
    "rng_tinymt": {"rng": "tinymt"},
    "rng_tpu_hw": {"rng": "tpu_hw"},
}


def time_variant(name: str, overrides: dict) -> float | None:
    overrides = dict(overrides)
    cone_cull = overrides.pop("_cone_cull", True)
    cfg = BASE.replace(**overrides)
    try:
        cfg.validate()
    except ValueError as e:
        print(f"{name:16s} skipped ({e})", flush=True)
        return None
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    camera = jnp.asarray(Camera.from_config(cfg).packed())
    step = build_sphere_step(cfg, scene, tile_grid(cfg), cone_cull=cone_cull)
    state = init_frame_state(cfg)
    state = step(state, camera)
    state.output.block_until_ready()
    frames = 20
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(frames):
            state = step(state, camera)
        state.output.block_until_ready()
        dt = min(dt, (time.perf_counter() - t0) / frames)
    per_spp = dt * 1e3 / cfg.spp_per_step
    print(f"{name:16s} {dt * 1e3:7.3f} ms/step  {per_spp:7.3f} ms/full-frame-spp",
          flush=True)
    return dt


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    print(f"device={jax.devices()[0]}", flush=True)
    for name in names:
        time_variant(name, VARIANTS[name])


if __name__ == "__main__":
    main()
