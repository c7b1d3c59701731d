"""Next event estimation (direct light sampling).

An item from the reference's own wishlist (/root/reference/TODO.md: "Next
event estimation") it never built. The reference's emissive spheres (every
16th index, radiance emission_scale/(4 pi r^2), sphere_pathtracing.cs.glsl:
285-290) are tiny, so BSDF-only sampling almost never finds them — NEE
samples a point on one explicitly at every diffuse vertex and casts a
shadow ray.

Estimator (uniform-area sampling of one uniformly-picked light):
  pdf = 1 / (E * 4 pi r^2);  Le = scale / (4 pi r^2)
  direct = T * (albedo/pi) * Le * cos(theta) * cos(theta_L) / (d^2 * pdf)
         = T * (albedo/pi) * scale * E * cos(theta) * cos(theta_L) / d^2
(the light's area cancels against its radiance). To stay unbiased without
MIS, emission found by *indirect* BSDF rays is suppressed — every diffuse
vertex already accounts for it via NEE; direct camera hits on lights keep
their emission.

Lane-lockstep: lights are picked per lane with a select-sweep over the E
emissive spheres (no gathers), so the same code runs in the oracle and in
Pallas kernels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from l2n_tpu.maths.sampling import PI


@dataclasses.dataclass
class LightSample:
    px: jnp.ndarray   # sampled point on the light surface
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray   # light surface normal at the point
    ny: jnp.ndarray
    nz: jnp.ndarray
    index: jnp.ndarray  # scene index of the picked light


def emissive_count(sphere_count: int, emissive_every: int) -> int:
    return (sphere_count + emissive_every - 1) // emissive_every


def make_sphere_light_sampler(sphere_count: int, emissive_every: int, fetch):
    """Light sampler over the scene's emissive spheres.

    fetch(i) -> (cx, cy, cz, r2) like the intersection sweeps. Returns
    sample(u_pick, u1, u2) -> LightSample; all inputs are lane arrays in
    (0, 1).
    """
    n_lights = emissive_count(sphere_count, emissive_every)

    def sample(u_pick, u1, u2) -> LightSample:
        f32 = jnp.float32
        pick = jnp.minimum((u_pick * f32(n_lights)).astype(jnp.int32),
                           n_lights - 1)
        shape = jnp.shape(u_pick)
        cx = jnp.zeros(shape, f32)
        cy = jnp.zeros(shape, f32)
        cz = jnp.zeros(shape, f32)
        r = jnp.ones(shape, f32)
        idx = jnp.zeros(shape, jnp.int32)
        # Select-sweep over the E lights (E is small; no per-lane gather).
        for e in range(n_lights):
            scx, scy, scz, sr2 = fetch(e * emissive_every)
            m = pick == e
            cx = jnp.where(m, scx, cx)
            cy = jnp.where(m, scy, cy)
            cz = jnp.where(m, scz, cz)
            r = jnp.where(m, jnp.sqrt(sr2), r)
            idx = jnp.where(m, jnp.int32(e * emissive_every), idx)
        # Uniform point on the sphere surface.
        z = f32(1.0) - f32(2.0) * u1
        s = jnp.sqrt(jnp.maximum(f32(0.0), f32(1.0) - z * z))
        phi = f32(2.0 * PI) * u2
        wx = s * jnp.cos(phi)
        wy = s * jnp.sin(phi)
        return LightSample(px=cx + r * wx, py=cy + r * wy, pz=cz + r * z,
                           nx=wx, ny=wy, nz=z, index=idx)

    sample.n_lights = n_lights
    return sample


def nee_contribution(cfg, n_lights: int, intersect, light: LightSample,
                     hx, hy, hz, nx, ny, nz, kd_r, kd_g, kd_b,
                     tp_r, tp_g, tp_b):
    """Direct-light radiance for diffuse vertices at (h, n) with albedo kd
    and path throughput tp. Returns (r, g, b) — zero where shadowed or
    back-facing."""
    f32 = jnp.float32
    lx = light.px - hx
    ly = light.py - hy
    lz = light.pz - hz
    d2 = lx * lx + ly * ly + lz * lz
    dist = jnp.sqrt(jnp.maximum(d2, f32(1e-20)))
    rcp = f32(1.0) / dist
    lx, ly, lz = lx * rcp, ly * rcp, lz * rcp
    cos_s = jnp.maximum(nx * lx + ny * ly + nz * lz, f32(0.0))
    cos_l = jnp.maximum(-(light.nx * lx + light.ny * ly + light.nz * lz),
                        f32(0.0))
    # Shadow ray: visible iff the picked light is the first thing hit.
    sh = intersect(hx + f32(cfg.ray_epsilon) * lx,
                   hy + f32(cfg.ray_epsilon) * ly,
                   hz + f32(cfg.ray_epsilon) * lz, lx, ly, lz)
    visible = sh.index == light.index
    scale = (f32(cfg.emission_scale * n_lights / PI) * cos_s * cos_l
             / jnp.maximum(d2, f32(1e-20)))
    w = jnp.where(visible, scale, f32(0.0))
    return (tp_r * kd_r * w, tp_g * kd_g * w, tp_b * kd_b * w)
