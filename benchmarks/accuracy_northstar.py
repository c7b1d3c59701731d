"""Accuracy north star: per-sample RMSE at 1024x1024 on the real chip.

BASELINE.md:21 states the rebuild's accuracy target: per-sample RMSE
< 1e-3 vs a GLSL-equivalent reference at 1024x1024 on TPU v5e. The
dual-implementation RMSE gates in tests/ run at small resolutions on the
CPU mesh; this script produces the number at the stated resolution on
the stated hardware.

Protocol: render the headline scene (128 procedural spheres, depth-2 +
RR, Mandelbrot env — /root/reference/src/shaders/sphere_pathtracing.cs.glsl
is the semantic reference) with the production Pallas kernel and with
the independent XLA oracle (`ops/pathtrace.trace_path`, the line-by-line
GLSL-equivalent implementation) on IDENTICAL threefry sample streams,
then compare per-sample radiance estimates (accum / count). With the
streams pinned, the residual is pure compiled-float reassociation — the
quantity the north star bounds.

Usage:  python benchmarks/accuracy_northstar.py [steps] [--fast]
Output: one JSON line with per-sample and accumulation-domain stats.

--fast: build the KERNEL with cfg.fast_math=True (the rsqrt-form sweeps,
the production headline config) while the oracle keeps the exact sqrt —
so the reported RMSE bounds the production kernel's TOTAL deviation from
the exact GLSL-equivalent semantics, fast-math drift included.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from l2n_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()

from l2n_tpu.camera import Camera  # noqa: E402
from l2n_tpu.config import RenderConfig  # noqa: E402
from l2n_tpu.render.state import init_frame_state  # noqa: E402
from l2n_tpu.render.step import build_render_step  # noqa: E402
from l2n_tpu.scene import compute_spheres  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    fast = "--fast" in args
    args = [a for a in args if a != "--fast"]
    steps = int(args[0]) if args else 1
    cfg = RenderConfig(width=1024, height=1024, tile_height=32,
                       tile_width=128, tiles_per_step=1024,
                       spp_per_step=4, rng="threefry").validate()
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    camera = Camera.from_config(cfg)
    packed = camera.packed()

    import jax
    dev = jax.devices()[0]
    print(f"device={dev} image={cfg.width}x{cfg.height} "
          f"spp/step={cfg.spp_per_step} steps={steps}", file=sys.stderr)

    t0 = time.monotonic()
    kernel_cfg = cfg.replace(fast_math=True) if fast else cfg
    kernel_step = build_render_step(kernel_cfg, scene, backend="pallas",
                                    donate=False)
    st_k = init_frame_state(cfg)
    for _ in range(steps):
        st_k = kernel_step(st_k, packed)
    st_k.output.block_until_ready()
    print(f"pallas kernel done ({time.monotonic() - t0:.1f}s)",
          file=sys.stderr)

    t0 = time.monotonic()
    oracle_step = build_render_step(cfg, scene, backend="xla", donate=False)
    st_o = init_frame_state(cfg)
    for _ in range(steps):
        st_o = oracle_step(st_o, packed)
    st_o.output.block_until_ready()
    print(f"xla oracle done ({time.monotonic() - t0:.1f}s)", file=sys.stderr)

    a, b = np.asarray(st_k.accum, np.float64), np.asarray(st_o.accum,
                                                          np.float64)
    h, w = cfg.height, cfg.width
    a, b = a[:, :h, :w], b[:, :h, :w]  # crop tile padding
    count_a, count_b = a[3], b[3]
    assert (count_a == count_b).all(), "coverage mismatch"
    assert count_a.min() > 0, "uncovered pixels in a whole-frame step"

    # Per-sample radiance estimates: accumulated RGB / sample count.
    ps_a, ps_b = a[:3] / count_a, b[:3] / count_b
    diff = np.abs(ps_a - ps_b)
    rmse = float(np.sqrt((diff ** 2).mean()))

    # Per-sample radiance is DISCONTINUOUS in the ray: at silhouettes a
    # one-ulp difference in the compiled float schedule flips WHICH sphere
    # the path hits, changing that sample's radiance by O(emitter). The
    # native-parity gate (tests/test_native.py:335) therefore separates
    # discrete hit-flips from continuous float drift; same split here.
    # A single flipped sample moves the per-pixel mean by magnitude/spp;
    # continuous drift is ~1e-5. Threshold: half a radiance unit in one
    # sample — far above drift, below any real flip.
    spp = float(count_a.mean())
    flip = diff.max(axis=0) > 0.5 / spp
    cont = ~flip
    rmse_cont = float(np.sqrt((diff[:, cont] ** 2).mean()))
    stats = {
        "per_sample_rmse": rmse,
        "per_sample_max_abs": float(diff.max()),
        "flip_pixel_fraction": float(flip.mean()),
        "rmse_excluding_flips": rmse_cont,
        "accum_rmse": float(np.sqrt(((a - b) ** 2).mean())),
        "spp": spp,
        "north_star": 1e-3,
        "pass_excluding_flips": rmse_cont < 1e-3,
        "pass": rmse < 1e-3,
        "kernel_fast_math": fast,
        "device": str(dev),
    }
    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
