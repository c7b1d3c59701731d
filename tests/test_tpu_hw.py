"""Hardware-only tests: the rng="tpu_hw" sampler (pltpu.prng_random_bits).

The hardware PRNG has no interpret-mode or oracle analog, so its gates are
STATISTICAL: a converged tpu_hw render must estimate the same image as the
bit-parity threefry render (both are unbiased Monte Carlo estimators of the
same integral). Run with:

    L2N_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_hw.py -v

(the default suite forces the virtual CPU mesh and skips these).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="rng='tpu_hw' needs a real TPU (set L2N_TEST_PLATFORM=tpu)")


def _render(cfg, steps):
    from l2n_tpu.camera import Camera
    from l2n_tpu.render.program import SphereProgram
    from l2n_tpu.render.state import init_frame_state

    prog = SphereProgram(cfg, backend="pallas")
    camera = Camera.from_config(cfg).packed()
    state = init_frame_state(cfg)
    for _ in range(steps):
        state = prog.step(state, camera)
    acc = np.asarray(state.accum)
    return acc[:3, :cfg.height, :cfg.width] / acc[3:4, :cfg.height, :cfg.width]


def test_tpu_hw_matches_threefry_estimate():
    """Converged mean images agree within Monte Carlo noise."""
    from l2n_tpu.config import RenderConfig

    base = RenderConfig(width=256, height=128, tile_height=32, tile_width=128,
                        tiles_per_step=8, spp_per_step=4).validate()
    steps = 32  # 128 spp
    img_tf = _render(base.replace(rng="threefry"), steps)
    img_hw = _render(base.replace(rng="tpu_hw"), steps)
    # Identical estimators, independent samples: means match to O(sigma/sqrt(N)).
    assert abs(float(img_hw.mean() - img_tf.mean())) < 0.02
    # Per-pixel agreement at MC-noise scale (sky pixels are deterministic-ish,
    # emissive-adjacent pixels are heavy-tailed; compare medians of |diff|).
    med = float(np.median(np.abs(img_hw - img_tf)))
    assert med < 0.05, med


def test_tpu_hw_steps_decorrelated():
    """Two successive steps draw different samples (the seed advances with
    the accumulated count), so accumulation must keep converging, not
    repeat the first estimate."""
    from l2n_tpu.config import RenderConfig

    cfg = RenderConfig(width=128, height=64, tile_height=32, tile_width=128,
                       tiles_per_step=2, spp_per_step=1,
                       rng="tpu_hw").validate()
    from l2n_tpu.camera import Camera
    from l2n_tpu.render.program import SphereProgram
    from l2n_tpu.render.state import init_frame_state

    prog = SphereProgram(cfg, backend="pallas")
    camera = Camera.from_config(cfg).packed()
    state = init_frame_state(cfg)
    state = prog.step(state, camera)
    one = np.asarray(state.accum[:3]).copy()
    state = prog.step(state, camera)
    two = np.asarray(state.accum[:3]) - one
    # The second step's contribution must differ from the first.
    assert not np.allclose(one, two)
