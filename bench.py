#!/usr/bin/env python
"""Benchmark harness: Mrays/sec/chip for the fused sphere path tracer.

Headline config (BASELINE.json): 1024x1024, the reference's 128-sphere
procedural scene, depth-2 diffuse GI with Russian roulette and the
Mandelbrot environment, counter-based threefry RNG, full frame per step.

Metric definition: a "ray" is a physical path segment actually cast — 1
primary per sample plus one continuation per Russian-roulette survivor
(measured on this scene/camera via an instrumented oracle pass, not
assumed). `vs_baseline` is the ratio to the 1 Gray/sec/chip north star
(BASELINE.md).

Prints ONE JSON line on stdout; human-readable detail goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time



def log(*args):
    print(*args, file=sys.stderr, flush=True)


def measure_mean_segments(cfg, scene, camera) -> float:
    """Instrumented oracle pass: 1 + sum of RR-survivor fractions."""
    import jax.numpy as jnp
    from l2n_tpu.ops.pathtrace import generate_rays, trace_path
    from l2n_tpu.render.step import make_intersector
    from l2n_tpu.rng.sampler import ThreefrySampler, max_pairs_per_sample

    intersect, _, _, _ = make_intersector(cfg, scene)
    h, w = 256, 256  # statistics resolution (fractions converge fast)
    py, px = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.int32) * (cfg.height // h),
        jnp.arange(w, dtype=jnp.int32) * (cfg.width // w), indexing="ij")
    pixel_index = (px + py * jnp.int32(cfg.padded_width)).astype(jnp.uint32)
    sampler = ThreefrySampler(cfg.seed, 0, pixel_index,
                              jnp.zeros((h, w), jnp.uint32),
                              max_pairs_per_sample(cfg.max_bounces))
    u1, u2 = sampler.draw2()
    rays = generate_rays(cfg, jnp.asarray(camera.packed()),
                         px.astype(jnp.float32), py.astype(jnp.float32),
                         u1, u2)
    stats: dict = {}
    trace_path(cfg, intersect, sampler, *rays, stats=stats)
    return 1.0 + float(sum(float(s) for s in stats["survive_fraction"]))


def main() -> None:
    from l2n_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()  # warm starts: kernels compile in minutes cold
    import jax
    from l2n_tpu.camera import Camera
    from l2n_tpu.config import RenderConfig
    from l2n_tpu.render.program import SphereProgram
    from l2n_tpu.render.state import init_frame_state
    from l2n_tpu.scene import compute_spheres

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # Production config: the TPU hardware PRNG (rng="tpu_hw"). The
        # threefry parity sampler's throughput is reported in detail below;
        # all oracle-parity gates in tests/ run with threefry/tinymt.
        # Whole-frame steps (tiles_per_step = all 1024 tiles — the
        # reference's GUI-tunable knob, src/main.cpp:974): measured ~3%
        # faster than 256-tile steps (fewer per-step schedule gathers).
        cfg = RenderConfig(width=1024, height=1024, tile_height=32,
                           tile_width=128, tiles_per_step=1024,
                           spp_per_step=4, rng="tpu_hw").validate()
        # steps_per_call fuses scheduler steps into one dispatch (identical
        # images — see tests/test_kernels.py::TestStepsPerCall); dispatch
        # through the tunnel-attached chip costs ~1.3 ms/step unamortized.
        backend, calls, spc = "pallas", 4, 5
    else:  # CPU fallback so the harness always emits a result
        cfg = RenderConfig(width=256, height=256, tile_height=32,
                           tile_width=128, tiles_per_step=16).validate()
        backend, calls, spc = "xla", 3, 1
    frames = calls * spc  # scheduler steps per timed repetition
    log(f"backend={backend} device={jax.devices()[0]} "
        f"image={cfg.width}x{cfg.height} tiles/step={cfg.effective_tiles_per_step}")

    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    camera = Camera.from_config(cfg)
    prog = SphereProgram(cfg, scene=scene, backend=backend,
                         steps_per_call=spc)
    state = init_frame_state(cfg)

    # Warm up / compile.
    state = prog.step(state, camera.packed())
    state.output.block_until_ready()

    def run_seq(n_calls):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state = prog.step(state, camera.packed())
        state.output.block_until_ready()
        return time.perf_counter() - t0

    # Steady-state (marginal) step time by difference timing: the tunnel-
    # attached chip pays a ~26 ms first-dispatch RTT per sequence, after
    # which dispatches pipeline and the chip runs back-to-back; timing one
    # short and one long sequence and differencing cancels the constant.
    # This is the production regime — a progressive render is a long
    # sequence of identical steps (src/main.cpp:951).
    dt = float("inf")
    long_calls = calls * 10
    for _ in range(3 if on_tpu else 1):
        t_short = run_seq(calls)
        t_long = run_seq(long_calls)
        dt = min(dt, (t_long - t_short) / ((long_calls - calls) * spc))

    pixels_per_step = (cfg.effective_tiles_per_step * cfg.tile_height
                       * cfg.tile_width * cfg.spp_per_step)
    samples_per_sec = pixels_per_step / dt
    spp_per_sec = samples_per_sec / (cfg.width * cfg.height)

    mean_segments = measure_mean_segments(cfg, scene, camera)
    mrays_per_sec = samples_per_sec * mean_segments / 1e6

    # Secondary: the bit-parity-friendly threefry sampler's throughput
    # (the default config; every oracle-parity gate runs with it).
    threefry_ms = None
    if on_tpu:
        tf_prog = SphereProgram(cfg.replace(rng="threefry"), scene=scene,
                                backend=backend, steps_per_call=spc)
        tf_state = init_frame_state(cfg)
        tf_state = tf_prog.step(tf_state, camera.packed())
        tf_state.output.block_until_ready()

        def tf_seq(n_calls):
            nonlocal tf_state
            t0 = time.perf_counter()
            for _ in range(n_calls):
                tf_state = tf_prog.step(tf_state, camera.packed())
            tf_state.output.block_until_ready()
            return time.perf_counter() - t0

        dt_tf = float("inf")
        for _ in range(2):
            dt_tf = min(dt_tf, (tf_seq(calls * 10) - tf_seq(calls))
                        / ((calls * 9) * spc))
        threefry_ms = dt_tf * 1e3
        log(f"threefry sampler: {threefry_ms:.2f} ms/step")

    # Secondary metric: the triangle-scene kernel (the reference's second
    # renderer; 128 meshes x 256 triangles).
    triangle_ms = None
    if on_tpu:
        from l2n_tpu.render.program import TriangleProgram
        # 256-tile steps measured ~7% faster than whole-frame steps for
        # the triangle kernel (smaller per-step shellwalk code footprint).
        tri_cfg = cfg.replace(scene_kind="triangle", spp_per_step=4,
                              tiles_per_step=256)
        tri = TriangleProgram(tri_cfg, backend=backend)
        tri_state = init_frame_state(tri_cfg)
        tri_state = tri.step(tri_state, camera.packed())
        tri_state.output.block_until_ready()

        def tri_seq(n):
            nonlocal tri_state
            t0 = time.perf_counter()
            for _ in range(n):
                tri_state = tri.step(tri_state, camera.packed())
            tri_state.output.block_until_ready()
            return time.perf_counter() - t0

        # Marginal (steady-state) like the headline metric.
        dt_tri = min((tri_seq(16) - tri_seq(2)) / 14 for _ in range(2))
        triangle_ms = dt_tri * 1e3 * (cfg.width * cfg.height) / (
            tri_cfg.effective_tiles_per_step * tri_cfg.tile_height
            * tri_cfg.tile_width * tri_cfg.spp_per_step)
        log(f"triangle scene: {triangle_ms:.1f} ms per full-frame spp")

    log(f"{dt * 1e3:.2f} ms/step, {samples_per_sec / 1e6:.1f} Msamples/s, "
        f"{spp_per_sec:.1f} spp/s, mean segments/sample {mean_segments:.3f}")
    log(f"=> {mrays_per_sec:.1f} Mrays/s (north star 1000)")

    result = {
        "metric": "Mrays/sec/chip (sphere path tracer, 1024x1024, depth 2 + RR)"
                  if on_tpu else "Mrays/sec (CPU fallback, 256x256)",
        "value": round(mrays_per_sec, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_sec / 1000.0, 4),
        "detail": {
            "samples_per_sec_M": round(samples_per_sec / 1e6, 2),
            "spp_per_sec": round(spp_per_sec, 2),
            "mean_segments_per_sample": round(mean_segments, 4),
            "ms_per_full_frame_spp": round(dt * 1e3 * (cfg.width * cfg.height)
                                           / pixels_per_step, 3),
            "triangle_ms_per_full_frame_spp": (round(triangle_ms, 1)
                                               if triangle_ms else None),
            "threefry_ms_per_step": (round(threefry_ms, 2)
                                     if threefry_ms else None),
            "rng": cfg.rng,
            "backend": backend,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
