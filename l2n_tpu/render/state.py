"""Functional frame state.

Everything the reference mutates across frames, as one pytree:
  * `accum`  — RGBA32F accumulation: rgb = sum of radiance samples, a =
    per-pixel sample count (the GL accum texture, src/main.cpp:880-886,
    updated at sphere_pathtracing.cs.glsl:391-395);
  * `output` — the tonemapped display image (uOutputImage); like the
    reference it is only rewritten for tiles rendered this step;
  * `tile_offset` — the wrap-around scheduler cursor (main.cpp:903,926-927);
  * `iteration` — frame counter (uIterationCount);
  * `rng_state` — packed per-pixel RNG states for the stateful parity modes
    (the resident TinyMT buffer, main.cpp:859-878); None under threefry,
    whose "state" is just the per-pixel sample count already in accum.a.

Clear-on-move / clear-on-switch semantics: `clear_accumulation` zeroes only
the accumulation — not the output (stale pixels keep displaying until
re-rendered), not the tile offset, not the RNG states — exactly
`clearFramebuffer` (main.cpp:944-948).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from l2n_tpu.rng import tinymt
from l2n_tpu.rng.state import init_tauslcg_states, init_tinymt_states


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameState:
    accum: jnp.ndarray            # (H, W, 4) f32
    output: jnp.ndarray           # (H, W, 3) f32
    tile_offset: jnp.ndarray      # () i32
    iteration: jnp.ndarray        # () i32
    rng_state: jnp.ndarray | None  # (H, W, 8) u32 (tinymt) | (H, W, 4) u32 | None


def init_frame_state(cfg) -> FrameState:
    h, w = cfg.height, cfg.width
    rng_state = None
    if cfg.rng == "tinymt":
        status, params = init_tinymt_states(h, w, cfg.seed)
        rng_state = tinymt.pack(status, params)
    elif cfg.rng == "tauslcg":
        rng_state = jnp.stack(init_tauslcg_states(h, w, cfg.seed), axis=-1)
    return FrameState(
        accum=jnp.zeros((h, w, 4), jnp.float32),
        output=jnp.zeros((h, w, 3), jnp.float32),
        tile_offset=jnp.int32(0),
        iteration=jnp.int32(0),
        rng_state=rng_state,
    )


def clear_accumulation(state: FrameState) -> FrameState:
    """clearFramebuffer (main.cpp:944-948): accumulation only."""
    return dataclasses.replace(state, accum=jnp.zeros_like(state.accum))


def samples_per_pixel(state: FrameState) -> np.ndarray:
    return np.asarray(state.accum[..., 3])
