"""Animated UV-gradient test kernel.

Rebuild of the reference's unused demo shader
(/root/reference/src/shaders/uv.cs.glsl): writes
(0.5*(1+cos(t)) * u, 0.5*(1+sin(t)) * v, 0) over the whole image with
global (non-tiled) indexing. Useful as a minimal smoke test that the Pallas
display path works on a given backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from l2n_tpu.ops.kernels.common import interpret_mode


def _kernel(height, width, t_ref, out_ref):
    h, w = out_ref.shape[1], out_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    u = col / jnp.float32(width)
    v = row / jnp.float32(height)
    t = t_ref[0, 0]
    out_ref[0] = jnp.float32(0.5) * (jnp.float32(1.0) + jnp.cos(t)) * u
    out_ref[1] = jnp.float32(0.5) * (jnp.float32(1.0) + jnp.sin(t)) * v
    out_ref[2] = jnp.zeros((h, w), jnp.float32)


def uv_demo(height: int, width: int, time_s) -> jnp.ndarray:
    """(3, height, width) animated UV pattern (uv.cs.glsl:12-20)."""
    t = jnp.asarray(time_s, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        partial(_kernel, height, width),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, height, width), jnp.float32),
        interpret=interpret_mode(),
    )(t)
