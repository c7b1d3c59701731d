"""Pallas TPU kernel tier — the native analog of the reference's GLSL
compute shaders (/root/reference/src/shaders/*.cs.glsl).

One fused kernel per scene family performs the reference's whole per-pixel
pipeline — tile->pixel mapping, RNG, jittered ray-gen, intersection sweep,
masked bounce loop, accumulate + tonemap — in VMEM, writing each pixel once
(`sphere_pathtracing.cs.glsl:353-398`). The tile schedule arrives as a
scalar-prefetch operand so the grid's block index maps place each program on
its shuffled tile, the exact analog of `uTileArray[(workgroup + offset) %
tileCount]` (glsl:356-357).

The `KERNELS` registry is the shader-library analog (`ShaderLibrary`,
src/shaders.hpp:14): scene kernels register here and `build_pallas_step`
"links" one against the configured RNG module (the reference links the RNG
as a second GLSL unit, src/main.cpp:688).
"""

from __future__ import annotations

from typing import Callable

KERNELS: dict[str, Callable] = {}


def register_kernel(name: str):
    def deco(fn):
        KERNELS[name] = fn
        return fn
    return deco


from l2n_tpu.ops.kernels import sphere_pt, triangle_pt  # noqa: E402,F401
from l2n_tpu.ops.kernels.uv_demo import uv_demo  # noqa: E402,F401


def build_pallas_step(cfg, scene, tile_array, donate: bool = True,
                      steps_per_call: int = 1, lights=None):
    """Compile-time dispatch on cfg.scene_kind (the renderer combo,
    src/main.cpp:976-980). Returns an ALREADY-jitted step — builders manage
    their own jit boundary so per-camera precomputations (visibility tables,
    mesh orders) can be cached host-side instead of recomputed per step.
    `lights` (ops.lights.ExplicitLights or None): trace-time constants for
    the explicit light/material term."""
    if (cfg.wavefront and cfg.scene_kind == "sphere"
            and cfg.aov == "pathtracing"):
        # Compacted-bounce wavefront variant (non-pathtracing AOVs have no
        # bounce machinery to compact; triangle pass A lands separately).
        if lights is not None:
            raise ValueError("explicit lights + wavefront is unsupported")
        from l2n_tpu.ops.kernels.wavefront import build_sphere_wavefront_step
        return build_sphere_wavefront_step(cfg, scene, tile_array,
                                           donate=donate,
                                           steps_per_call=steps_per_call)
    try:
        builder = KERNELS[cfg.scene_kind]
    except KeyError:
        raise ValueError(
            f"no pallas kernel registered for scene {cfg.scene_kind!r}"
        ) from None
    return builder(cfg, scene, tile_array, donate=donate,
                   steps_per_call=steps_per_call, lights=lights)
