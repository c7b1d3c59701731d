"""Device mesh construction for the renderer's (tile, sample) axes."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def mesh_factors(n_devices: int, cfg=None) -> tuple[int, int]:
    """Split n devices into (n_tile, n_sample).

    Prefer tile-sharding (it needs no collectives); keep a sample axis of 2
    when the device count allows so the step exercises a real psum. The
    tile factor must divide the tile-grid rows when a config is given.
    """
    n_sample = 2 if n_devices % 2 == 0 and n_devices > 2 else 1
    n_tile = n_devices // n_sample
    if cfg is not None:
        while n_tile > 1 and cfg.tile_count_y % n_tile != 0:
            n_tile //= 2
        n_sample = n_devices // n_tile if n_devices % n_tile == 0 else 1
    return n_tile, n_sample


def make_device_mesh(n_tile: int | None = None, n_sample: int = 1,
                     devices=None) -> Mesh:
    """Mesh with named axes ("tile", "sample"). Defaults to all devices on
    the tile axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tile is None:
        n_tile = len(devices) // n_sample
    need = n_tile * n_sample
    if need > len(devices):
        raise ValueError(
            f"{n_tile} x {n_sample} mesh needs {need} devices, "
            f"have {len(devices)}")
    devices = devices[:need]
    arr = np.asarray(devices).reshape(n_tile, n_sample)
    return Mesh(arr, axis_names=("tile", "sample"))
