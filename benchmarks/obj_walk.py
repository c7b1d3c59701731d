"""Torus-field OBJ scene: throughput + DCE-controlled walk ablations.

The bench.py `obj` tertiary stage measures the headline number; this
script is the measurement protocol behind the slab-walk optimization work
(benchmarks/PROFILE.md). Variants (env `L2N_TRI_ABLATE`, read by the
kernel at trace time, ops/kernels/triangle_pt.py):

  full     (default)  the production kernel
  noflags  walk every (mesh, slab) item — isolates the flag pass's value
  nowalk   flag passes only, no bounce walks — isolates the walk cost
           (NOT image-correct; timing probe only)
  nodma    skip the VMEM->SMEM slab copies — isolates the synchronous
           DMA's share (NOT image-correct; decides whether prefetch
           double-buffering could pay)

Knobs worth sweeping alongside (also trace-time env):
  L2N_TRI_SLAB  slab size (default 128; 256 measured worse: 21.9 vs 17.2)
  L2N_TRI_SUBS  sub-clusters per slab (default 8)

Run: python benchmarks/obj_walk.py [ablate]   (TPU)
With "ablate", runs all three L2N_TRI_ABLATE variants in-process
(the env is read at trace time, so each variant retraces).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from l2n_tpu.utils.compile_cache import enable  # noqa: E402

enable()

from l2n_tpu.camera import Camera  # noqa: E402
from l2n_tpu.config import RenderConfig  # noqa: E402
from l2n_tpu.render.program import TriangleProgram  # noqa: E402
from l2n_tpu.render.state import init_frame_state  # noqa: E402
from l2n_tpu.scene.obj import load_obj  # noqa: E402
from l2n_tpu.scene.procgen import torus_field_obj  # noqa: E402


def measure(tag: str, cfg, scene) -> float:
    prog = TriangleProgram(cfg, scene=scene, backend="pallas")
    packed = Camera.from_config(cfg).packed()
    state = init_frame_state(cfg)
    t0 = time.perf_counter()
    state = prog.step(state, packed)
    state.output.block_until_ready()
    tc = time.perf_counter() - t0

    def run_seq(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state = prog.step(state, packed)
        state.output.block_until_ready()
        return time.perf_counter() - t0

    dt = float("inf")
    for _ in range(2):
        ts = run_seq(2)
        tl = run_seq(12)
        dt = min(dt, (tl - ts) / 10)
    ms_full = dt * 1e3 * (cfg.width * cfg.height) / (
        cfg.effective_tiles_per_step * cfg.tile_height * cfg.tile_width
        * cfg.spp_per_step)
    print(f"{tag}: {dt * 1e3:.2f} ms/step -> {ms_full:.1f} ms/frame-spp "
          f"(compile+first {tc:.1f}s)", flush=True)
    return ms_full


def main() -> None:
    import jax
    print("device:", jax.devices()[0], file=sys.stderr)
    cfg = RenderConfig(width=1024, height=1024, tile_height=32,
                       tile_width=128, tiles_per_step=256, spp_per_step=4,
                       scene_kind="triangle").validate()
    scene = load_obj(torus_field_obj())
    print(f"meshes={scene.mesh_count} tris={scene.total_triangles}",
          file=sys.stderr)
    arg = sys.argv[1] if len(sys.argv) > 1 else ""
    if arg == "ablate":
        for tag in ("full", "noflags", "nowalk", "nodma"):
            os.environ["L2N_TRI_ABLATE"] = "" if tag == "full" else tag
            measure(tag, cfg, scene)
    elif arg in ("noflags", "nowalk", "nodma"):
        # One variant per process: each is its own multi-minute Mosaic
        # compile, so budget them separately.
        os.environ["L2N_TRI_ABLATE"] = arg
        measure(arg, cfg, scene)
    else:
        measure("torus-field", cfg, scene)


if __name__ == "__main__":
    main()
