"""Shared plumbing for the fused path-tracing kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from l2n_tpu.rng.sampler import (
    TausLCGSampler,
    ThreefrySampler,
    TinyMTSampler,
    max_pairs_per_sample,
)
from l2n_tpu.rng.threefry import uniform_oo_from_bits


def interpret_mode() -> bool:
    """Kernels run compiled on TPU; everywhere else (CPU tests, the virtual
    device mesh) they run in the Pallas interpreter — the analog of the
    reference's synchronous debug context as a validation layer (SURVEY §4)."""
    return jax.default_backend() != "tpu"


def tile_pixel_coords(cfg, tile_x, tile_y):
    """(row, col) int32 arrays of shape (tile_height, tile_width) for a tile:
    pixelCoords = tile * tileSize + localInvocation (glsl:359)."""
    th, tw = cfg.tile_height, cfg.tile_width
    row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + tile_y * th
    col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tile_x * tw
    return row, col


class TpuHwSampler:
    """Draws from the TPU core's hardware PRNG (pltpu.prng_random_bits).

    Stateless from the tracer's point of view (masks are ignored; nothing is
    consumed per lane) but sequenced by the core PRNG, which the caller must
    seed once per (tile, sample, stream) via `seed_tpu_hw` before drawing.
    By far the cheapest sampler — a threefry block is ~120 vector ops, a
    hardware draw is one instruction."""

    stateful = False

    def __init__(self, shape):
        self._shape = shape

    def draw2(self, mask=None):
        return self.draw1(), self.draw1()

    def draw1(self, mask=None):
        bits = pltpu.bitcast(pltpu.prng_random_bits(self._shape), jnp.uint32)
        return uniform_oo_from_bits(bits)

    def final_state(self):
        return None


def seed_tpu_hw(cfg, sample_index, stream):
    """Seed the core PRNG for this (program, sample, stream). Mosaic caps
    prng_seed at two 32-bit values, so the per-step scalars are mixed into
    one word with distinct odd multipliers (Knuth/Murmur-style)."""
    mix = ((pl.program_id(0) * jnp.int32(-1640531527))
           ^ (jnp.asarray(sample_index, jnp.int32) * jnp.int32(-2048144789))
           ^ (jnp.asarray(stream, jnp.int32) * jnp.int32(0x27220A95)))
    pltpu.prng_seed(jnp.int32(cfg.seed), mix)


def make_kernel_sampler(cfg, pixel_index, sample_index, rng_in_ref,
                        rng_out_ref, stream=0, shape=None):
    """Build the configured sampler inside a kernel body.

    For stateful modes the per-pixel state planes ride in/out as aliased
    VMEM blocks; returns (sampler, finalize) where finalize() writes the
    stepped states to the output ref. `stream` decorrelates shard replicas.

    `sample_index` may be a scalar or a lane array for the counter-based
    modes; "tpu_hw" requires a scalar (it feeds the seed register).
    `shape` is the lane-block shape for shape-carrying samplers (defaults
    to one tile; the stacked-sample kernel passes (spp*th, tw)).
    """
    if shape is None:
        shape = (cfg.tile_height, cfg.tile_width)
    if cfg.rng == "threefry":
        sampler = ThreefrySampler(cfg.seed, stream, pixel_index, sample_index,
                                  max_pairs_per_sample(cfg.max_bounces,
                                                       cfg.nee,
                                                       cfg.fog_density > 0))
        return sampler, lambda: None
    if cfg.rng == "tpu_hw":
        if interpret_mode():
            raise NotImplementedError(
                "rng='tpu_hw' needs a real TPU (the Pallas interpreter has "
                "no pltpu.prng_seed); use rng='threefry' off-TPU")
        seed_tpu_hw(cfg, sample_index, stream)
        return TpuHwSampler(shape), lambda: None
    if cfg.rng == "tinymt":
        words = tuple(rng_in_ref[i] for i in range(7))
        sampler = TinyMTSampler(words[:4], words[4:7])

        def finalize():
            final = sampler.final_state()
            for i in range(4):
                rng_out_ref[i] = final[i]
            for i in range(4, 8):
                rng_out_ref[i] = rng_in_ref[i]
        return sampler, finalize
    if cfg.rng == "tauslcg":
        sampler = TausLCGSampler(tuple(rng_in_ref[i] for i in range(4)))

        def finalize():
            final = sampler.final_state()
            for i in range(4):
                rng_out_ref[i] = final[i]
        return sampler, finalize
    raise ValueError(cfg.rng)  # pragma: no cover


def safe_gamma(x, gamma: float):
    """pow(x, gamma) for x >= 0 without NaN at 0 (Mosaic-safe exp/log form);
    the display transform pow(rgb/n, 0.45) (glsl:392)."""
    g = jnp.float32(gamma)
    safe = jnp.maximum(x, jnp.float32(1e-30))
    return jnp.where(x <= 0.0, jnp.float32(0.0), jnp.exp(g * jnp.log(safe)))


def accumulate_and_tonemap(cfg, accum_in_ref, accum_out_ref, out_ref, r, g, b,
                           spp: int = 1):
    """newEstimate = current + (color_sum, spp); out = pow(rgb/n, gamma)
    (glsl:391-395) over the whole tile block; r/g/b are sums of `spp`
    samples."""
    n = accum_in_ref[3] + jnp.float32(spp)
    cr = accum_in_ref[0] + r
    cg = accum_in_ref[1] + g
    cb = accum_in_ref[2] + b
    accum_out_ref[0] = cr
    accum_out_ref[1] = cg
    accum_out_ref[2] = cb
    accum_out_ref[3] = n
    inv = jnp.float32(1.0) / n
    out_ref[0] = safe_gamma(cr * inv, cfg.gamma)
    out_ref[1] = safe_gamma(cg * inv, cfg.gamma)
    out_ref[2] = safe_gamma(cb * inv, cfg.gamma)
