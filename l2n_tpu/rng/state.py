"""Per-pixel stateful RNG initialization (TinyMT / TausLCG parity modes).

TPU analog of `computeTinyMTStateVector` (/root/reference/src/main.cpp:859-878):
one RNG state per pixel, seeds drawn from a fixed-seed host Mersenne Twister
(std::mt19937 there, numpy MT19937 here) so runs are reproducible. The
reference also draws each pixel's (mat1, mat2, tmat) parameter triple from a
65,536-entry precomputed table of dynamically-created generators
(src/tinymt32dc.0.1048576.cpp); stream independence in this framework comes
from counter-based threefry instead, so the parity mode uses the canonical
triple for all pixels with distinct seeds. Pass `param_table` (an (N, 3)
uint32 array, e.g. loaded from the upstream tinymt32dc output) to reproduce
the reference's per-pixel-parameter scheme exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from l2n_tpu.rng import tinymt, tauslcg


def mt19937_seeds(n: int, seed: int = 0) -> np.ndarray:
    """n uint32 seeds from a Mersenne Twister (std::mt19937 rng analog,
    src/main.cpp:861-865)."""
    gen = np.random.Generator(np.random.MT19937(seed))
    return gen.integers(0, 2**32, size=n, dtype=np.uint32)


def init_tinymt_states(
    height: int, width: int, seed: int = 0,
    param_table: np.ndarray | None = None,
) -> tuple[tinymt.State, tinymt.Params]:
    """One TinyMT32 state per pixel, shaped (height, width)."""
    gen = np.random.Generator(np.random.MT19937(seed))
    seeds = gen.integers(0, 2**32, size=(height, width), dtype=np.uint32)
    params: tinymt.Params | None = None
    if param_table is not None:
        table = np.asarray(param_table, dtype=np.uint32)
        idx = gen.integers(0, table.shape[0], size=(height, width))
        params = (jnp.asarray(table[idx, 0]), jnp.asarray(table[idx, 1]),
                  jnp.asarray(table[idx, 2]))
    return tinymt.init(jnp.asarray(seeds), params)


def init_tauslcg_states(height: int, width: int, seed: int = 0) -> tauslcg.State:
    """One TausLCG uvec4 state per pixel, shaped (height, width)."""
    seeds = mt19937_seeds(height * width, seed).reshape(height, width)
    return tauslcg.init(jnp.asarray(seeds))
