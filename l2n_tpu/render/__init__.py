"""Progressive render machinery: tile scheduling, frame state, render step.

TPU-functional rewrite of the reference's mutable GL render state — accum
texture, output image, per-pixel RNG buffer, tile offset
(/root/reference/src/main.cpp:830-948): everything lives in an immutable
`FrameState` pytree threaded through a jitted, buffer-donating render step.
"""

from l2n_tpu.render.tiles import tile_grid, advance_offset  # noqa: F401
from l2n_tpu.render.state import FrameState, init_frame_state, clear_accumulation  # noqa: F401
from l2n_tpu.render.step import build_render_step  # noqa: F401
from l2n_tpu.render.program import (  # noqa: F401
    PathtracingProgram,
    SphereProgram,
    TriangleProgram,
)
from l2n_tpu.render.renderer import Renderer  # noqa: F401
