"""Environment lights: Mandelbrot escape-time sky and the sun lobe.

`mandelbrot_le` mirrors the GPU kernel's env light
(/root/reference/src/shaders/sphere_pathtracing.cs.glsl:239-270) and `sun_le`
the CPU renderer's (src/main.cpp:401,445) — the reference deliberately uses
different env lights on the two paths; both are provided and selected by
`RenderConfig.env_mode`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from l2n_tpu.maths.fastmath import atan2
from l2n_tpu.maths.sampling import PI

MANDELBROT_ITERS = 64  # glsl:251


def mandelbrot_le(dx, dy, dz):
    """Scalar (greyscale) radiance of the Mandelbrot sky for direction d.

    Direction -> (u, v) plane: theta = atan2(|d.xy|, d.z), phi =
    atan2(d.y, d.x), u = phi/pi, v = -1 + 2*theta/pi, p = (8u, 4v)
    (glsl:241-248). Escape-time iteration z <- z^2 + p with the divergent
    `break` replaced by lane freezing: once |z|^2 > 4 a lane stops updating
    and remembers its escape iteration. Returns i/64 for diverged lanes, 0
    otherwise (glsl:265-269); the caller broadcasts to rgb.
    """
    f32 = jnp.float32
    sin_theta = jnp.sqrt(dx * dx + dy * dy)
    theta = atan2(sin_theta, dz)
    phi = atan2(dy, dx)
    u = phi * f32(1.0 / PI)
    v = f32(-1.0) + f32(2.0 / PI) * theta
    px = f32(8.0) * u
    py = f32(4.0) * v

    shape = jnp.shape(px)
    zx = jnp.zeros(shape, f32)
    zy = jnp.zeros(shape, f32)
    # Branch-free escape counting: `still` is 1.0 until the lane's FIRST
    # |z|^2 > 4 (matching the reference's `break` even if |z| later
    # re-enters the disk), `cnt` accumulates iterations spent bounded, which
    # equals the reference's escape index. Lanes keep iterating after
    # escape; overflow to inf/NaN is harmless (NaN comparisons are false,
    # so `ok` stays 0 and `still` is already latched at 0). This costs ~9
    # vector ops per iteration with NO select chains and no per-iteration
    # masks — measured faster than freezing lanes with `where`.
    still = jnp.ones(shape, f32)
    cnt = jnp.zeros(shape, f32)
    zx2 = jnp.zeros(shape, f32)
    zy2 = jnp.zeros(shape, f32)

    def step_i(_, carry):
        zx, zy, zx2, zy2, still, cnt = carry
        zy = f32(2.0) * zx * zy + py
        zx = zx2 - zy2 + px
        zx2 = zx * zx
        zy2 = zy * zy
        ok = (zx2 + zy2 <= f32(4.0)).astype(f32)
        still = still * ok
        cnt = cnt + still
        return zx, zy, zx2, zy2, still, cnt

    # Two-phase early exit: |p| > 2 over most of the sky, so typical lane
    # blocks fully escape within the first few iterations; one branch skips
    # the long tail when no lane is still bounded.
    prefix = min(8, MANDELBROT_ITERS)
    carry = (zx, zy, zx2, zy2, still, cnt)
    carry = jax.lax.fori_loop(0, prefix, step_i, carry)

    def tail(carry):
        return jax.lax.fori_loop(prefix, MANDELBROT_ITERS, step_i, carry)

    carry = jax.lax.cond(jnp.any(carry[4] > 0.0), tail, lambda c: c, carry)
    cnt = carry[5]
    return jnp.where(cnt < f32(MANDELBROT_ITERS),
                     cnt * f32(1.0 / MANDELBROT_ITERS), f32(0.0))


def sun_le(dx, dy, dz):
    """Scalar radiance of the sun lobe: pow(max(0, dot(sunDir, d)), 128)
    with sunDir = normalize(1, 1, -1) (src/main.cpp:401,445)."""
    import math
    f32 = jnp.float32
    s = f32(1.0 / math.sqrt(3.0))
    d = jnp.maximum(f32(0.0), s * dx + s * dy - s * dz)
    # pow(x, 128) as 7 squarings — cheaper and exact for integer powers.
    for _ in range(7):
        d = d * d
    return d


def env_radiance(mode: str, dx, dy, dz):
    """Dispatch on RenderConfig.env_mode (static)."""
    if mode == "mandelbrot":
        return mandelbrot_le(dx, dy, dz)
    if mode == "sun":
        return sun_le(dx, dy, dz)
    if mode == "none":
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(dx)), jnp.float32)
    raise ValueError(f"unknown env mode {mode!r}")
