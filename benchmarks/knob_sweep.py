"""Batch-geometry knob sweep for the sphere headline and torus OBJ scene.

Each variant in its own process would be safer for the tunnel, but the
compile cache makes in-process sequential variants acceptable. Prints one
line per variant: name, ms/step, ms per full-frame spp (and Mrays/s for
the sphere variants using the headline's mean-segments 1.2211).
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from l2n_tpu.utils.compile_cache import enable
enable()
import jax
print("device:", jax.devices()[0], file=sys.stderr)

from l2n_tpu.camera import Camera
from l2n_tpu.config import RenderConfig
from l2n_tpu.render.program import SphereProgram, TriangleProgram
from l2n_tpu.render.state import init_frame_state
from l2n_tpu.scene import compute_spheres
from l2n_tpu.scene.obj import load_obj
from l2n_tpu.scene.procgen import torus_field_obj

MEAN_SEG = 1.2211


def measure(prog, cfg, calls=4, spc=1, reps=2):
    packed = Camera.from_config(cfg).packed()
    state = init_frame_state(cfg)
    t0 = time.perf_counter()
    state = prog.step(state, packed)
    state.output.block_until_ready()
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def run_seq(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state = prog.step(state, packed)
        state.output.block_until_ready()
        return time.perf_counter() - t0

    dt = float("inf")
    for _ in range(reps):
        ts = run_seq(calls)
        tl = run_seq(calls * 10)
        dt = min(dt, (tl - ts) / (calls * 9 * spc))
    return dt


def sphere_variant(name, **kw):
    base = dict(width=1024, height=1024, tile_height=32, tile_width=128,
                tiles_per_step=1024, spp_per_step=4, rng="tpu_hw")
    base.update(kw)
    cfg = RenderConfig(**base).validate()
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    spc = 5
    prog = SphereProgram(cfg, scene=scene, backend="pallas",
                         steps_per_call=spc)
    dt = measure(prog, cfg, calls=4, spc=spc)
    pix = (cfg.effective_tiles_per_step * cfg.tile_height * cfg.tile_width
           * cfg.spp_per_step)
    mrays = pix / dt * MEAN_SEG / 1e6
    print(f"{name}: {dt*1e3:.3f} ms/step -> {mrays:.1f} Mrays/s", flush=True)


def tess_variant(name, **kw):
    """Tessellated-sphere triangle scene (bench stage_triangle's
    workload): 128 meshes x 256 triangles, shellwalk shortcut live."""
    base = dict(width=1024, height=1024, tile_height=32, tile_width=128,
                tiles_per_step=256, spp_per_step=4, scene_kind="triangle")
    base.update(kw)
    cfg = RenderConfig(**base).validate()
    prog = TriangleProgram(cfg, backend="pallas")
    dt = measure(prog, cfg, calls=2)
    ms_full = dt * 1e3 * (cfg.width * cfg.height) / (
        cfg.effective_tiles_per_step * cfg.tile_height * cfg.tile_width
        * cfg.spp_per_step)
    print(f"{name}: {dt*1e3:.2f} ms/step -> {ms_full:.1f} ms/frame-spp",
          flush=True)


def torus_variant(name, **kw):
    base = dict(width=1024, height=1024, tile_height=32, tile_width=128,
                tiles_per_step=256, spp_per_step=4, scene_kind="triangle")
    base.update(kw)
    cfg = RenderConfig(**base).validate()
    scene = load_obj(torus_field_obj())
    prog = TriangleProgram(cfg, scene=scene, backend="pallas")
    dt = measure(prog, cfg, calls=2)
    ms_full = dt * 1e3 * (cfg.width * cfg.height) / (
        cfg.effective_tiles_per_step * cfg.tile_height * cfg.tile_width
        * cfg.spp_per_step)
    print(f"{name}: {dt*1e3:.2f} ms/step -> {ms_full:.1f} ms/frame-spp",
          flush=True)


TORUS_VARIANTS = {
    "torus0": ("torus 32x128 spp4 (baseline)", {}),
    "torus1": ("torus 64x128 spp4",
               dict(tile_height=64, tiles_per_step=128)),
    "torus2": ("torus 32x128 spp1",
               dict(spp_per_step=1, tiles_per_step=1024)),
    "torus3": ("torus 16x128 spp4",
               dict(tile_height=16, tiles_per_step=512)),
}

TESS_VARIANTS = {
    # NB: at 1024x1024 with 32x128 tiles the grid has 256 tiles, so any
    # tiles_per_step >= 256 is the same whole-frame schedule
    # (effective_tiles_per_step caps at tile_count) — there is exactly ONE
    # spp1 whole-frame variant, not a t1024-vs-t256 pair.
    "tess0": ("tess 32x128 spp4 t256 (ship)", {}),
    "tess1": ("tess 32x128 spp1 whole-frame",
              dict(spp_per_step=1, tiles_per_step=1024)),
}

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which == "fastmath":
    # The round-4 fast-math candidate (cfg.fast_math: rsqrt-form root +
    # normal in the sphere sweeps) against the exact baseline, same
    # process so the comparison shares tunnel conditions.
    sphere_variant("sphere exact (baseline)")
    sphere_variant("sphere fast_math", fast_math=True)
if which in TESS_VARIANTS:
    name, kw = TESS_VARIANTS[which]
    tess_variant(name, **kw)
if which in ("all", "sphere"):
    sphere_variant("sphere 32x128 spp4 (baseline)")
    sphere_variant("sphere 64x128 spp4", tile_height=64, tiles_per_step=512)
    sphere_variant("sphere 32x256 spp4", tile_width=256, tiles_per_step=512)
    sphere_variant("sphere 32x128 spp8", spp_per_step=8)
    sphere_variant("sphere 16x128 spp4", tile_height=16, tiles_per_step=2048)
if which in ("all", "torus"):
    for name, kw in TORUS_VARIANTS.values():
        torus_variant(name, **kw)
elif which in TORUS_VARIANTS:  # one variant per process (Mosaic compiles
    name, kw = TORUS_VARIANTS[which]  # are minutes each; budget separately)
    torus_variant(name, **kw)
