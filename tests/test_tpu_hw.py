"""Hardware-only tests: the rng="tpu_hw" sampler (pltpu.prng_random_bits).

The hardware PRNG has no interpret-mode or oracle analog, so its gates are
(a) STATISTICAL at the bit level — monobit balance per bit position, byte
chi-square, per-lane balance, cross-draw correlation — and (b) STATISTICAL
at the estimator level — a converged tpu_hw render must estimate the same
image, with the same per-sample variance, as the bit-parity threefry
render (both are unbiased Monte Carlo estimators of the same integral).
Run with:

    L2N_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_hw.py -v

(the default suite forces the virtual CPU mesh and skips these).

Bound derivations: for n fair bits the ones-count is Binomial(n, 1/2);
all bounds below are ±6 sigma or looser, so a correct generator fails any
single assertion with p < 1e-8 and the gates are deterministic in practice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="rng='tpu_hw' needs a real TPU (set L2N_TEST_PLATFORM=tpu)")


# ---------------------------------------------------------------------------
# Raw-bit harness: one Pallas kernel that seeds the core PRNG and makes K
# successive (H, 128) draws — the same prng_seed/prng_random_bits pair the
# production sampler uses (ops/kernels/common.py:35-70).
# ---------------------------------------------------------------------------

def draw_raw_bits(seed0: int, seed1: int, k: int = 4, h: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], seed_ref[1])
        for i in range(k):
            o_ref[i] = pltpu.bitcast(
                pltpu.prng_random_bits((h, 128)), jnp.uint32)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[],
            out_specs=pl.BlockSpec((k, h, 128), lambda i, s: (0, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((k, h, 128), jnp.uint32),
    )
    seeds = jnp.asarray([seed0, seed1], jnp.int32)
    return np.asarray(jax.jit(call)(seeds))  # (k, h, 128) uint32


def _bits_by_position(words: np.ndarray) -> np.ndarray:
    """(32,) ones-count per bit position over a uint32 array."""
    w = words.reshape(-1)
    return np.array([(w >> b & 1).sum() for b in range(32)], np.int64)


def test_monobit_per_bit_position():
    """Every one of the 32 output bit positions is balanced. n = 4*256*128
    words per position => sigma = sqrt(n)/2 ~ 181; allow 6 sigma."""
    words = draw_raw_bits(0x1234, 0x5678)
    n = words.size
    ones = _bits_by_position(words)
    bound = 6 * np.sqrt(n) / 2
    assert np.abs(ones - n / 2).max() < bound, ones


def test_byte_chi_square():
    """Byte-value histogram is uniform: chi-square over 256 bins.
    dof=255 => mean 255, sigma ~ sqrt(2*255) ~ 22.6; allow mean + 8 sigma."""
    words = draw_raw_bits(0xBEEF, 7)
    by = words.view(np.uint8)
    hist = np.bincount(by.reshape(-1), minlength=256).astype(np.float64)
    expect = by.size / 256.0
    chi2 = float(((hist - expect) ** 2 / expect).sum())
    assert chi2 < 255 + 8 * np.sqrt(2 * 255), chi2


def test_per_lane_balance():
    """Ones-density is balanced per (vector lane, bit) cell — catches a
    per-lane structural defect (e.g. a lane-replicated stream) that the
    global monobit test would average away. n = 4*256*32 bits per lane."""
    words = draw_raw_bits(42, 99)
    pop = np.array([bin(x).count("1") for x in range(256)], np.int64)
    by = words.view(np.uint8).reshape(4, 256, 128, 4)  # lane-major bytes
    ones_per_lane = pop[by].sum(axis=(0, 1, 3))        # (128,)
    n = 4 * 256 * 32
    bound = 6 * np.sqrt(n) / 2
    assert np.abs(ones_per_lane - n / 2).max() < bound


def test_cross_draw_and_cross_seed_correlation():
    """Successive draws from one seed, and draws from different seeds, are
    uncorrelated at the bit level: matching-bit fraction ~ 1/2. Also pins
    determinism (same seed => identical stream) — the property the
    device-residency caches and resume paths rely on."""
    a = draw_raw_bits(1, 2)
    b = draw_raw_bits(1, 2)
    np.testing.assert_array_equal(a, b)  # deterministic per seed

    n = a[0].size * 32
    bound = 6 * np.sqrt(n) / 2
    for x, y in [(a[0], a[1]), (a[1], a[2]), (a[0], a[3]),
                 (a[0], draw_raw_bits(3, 2)[0]),
                 (a[0], draw_raw_bits(1, 3)[0])]:
        match = np.array([bin(v).count("1") for v in range(256)],
                         np.int64)[(~(x ^ y)).view(np.uint8)].sum()
        assert abs(match - n / 2) < bound, (match, n)


def test_uniform_oo_mapping():
    """uniform_oo_from_bits on hardware bits: open-open (0,1) support with
    the reference's exponent-trick distribution (rand_tinymt32.cs.glsl:176
    -179 analog): mean 1/2, variance 1/12, and never exactly 0 or 1."""
    from l2n_tpu.rng.threefry import uniform_oo_from_bits

    words = draw_raw_bits(0xABCD, 0x42, k=4)
    u = np.asarray(jax.jit(uniform_oo_from_bits)(jnp.asarray(words)))
    assert u.min() > 0.0 and u.max() < 1.0
    n = u.size
    assert abs(u.mean() - 0.5) < 6 * np.sqrt(1 / 12 / n)
    assert abs(u.var() - 1 / 12) < 0.001


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


def _step_contributions(cfg, steps):
    """Per-step sample-mean images (independent 1-step estimates)."""
    from l2n_tpu.camera import Camera
    from l2n_tpu.render.program import SphereProgram
    from l2n_tpu.render.state import init_frame_state

    prog = SphereProgram(cfg, backend="pallas")
    camera = Camera.from_config(cfg).packed()
    state = init_frame_state(cfg)
    prev = np.zeros((3, cfg.padded_height, cfg.padded_width), np.float32)
    out = []
    for _ in range(steps):
        state = prog.step(state, camera)
        acc = np.asarray(state.accum[:3])
        out.append((acc - prev) / cfg.spp_per_step)
        prev = acc
    return np.stack(out)[:, :, :cfg.height, :cfg.width]


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


def test_tpu_hw_variance_matches_threefry():
    """Equal-spp estimator variance: the headline sampler must not trade
    bias-freedom for extra variance. Compare the across-step variance maps
    of independent per-step estimates (same scene, same integrand) —
    ratio of per-sampler variance medians must be ~1 (VERDICT r2 item 7).

    Statistic choice matters: path-tracing pixel variances are heavy-tailed
    (rare bright events), so the median of the PIXELWISE ratio conditioned
    on `var_tf > eps` is biased well below 1 — the mask selects pixels where
    threefry's 24-sample variance estimate happened to fluctuate high
    (measured: pixelwise-ratio median ~0.5-0.8 for IDENTICAL-quality
    samplers, ratio of medians ~1.00). Each sampler therefore gets its own
    symmetric mask and one scalar median before the ratio is taken."""
    from l2n_tpu.config import RenderConfig

    cfg = RenderConfig(width=256, height=128, tile_height=32, tile_width=128,
                       tiles_per_step=8, spp_per_step=4).validate()
    steps = 24
    var_tf = _step_contributions(cfg.replace(rng="threefry"), steps).var(axis=0)
    var_hw = _step_contributions(cfg.replace(rng="tpu_hw"), steps).var(axis=0)
    med_tf = float(np.median(var_tf[var_tf > 1e-6]))
    med_hw = float(np.median(var_hw[var_hw > 1e-6]))
    ratio = med_hw / med_tf
    assert 0.8 < ratio < 1.25, (med_hw, med_tf)


def _kernel_vs_oracle(cfg, scene, cam, steps=2):
    """COMPILED kernel (pallas on the real chip) vs the XLA oracle, same
    threefry draws: count-exact + flip budget + estimator agreement
    (VERDICT r4 next #7). On hardware the two code paths genuinely differ
    in fma contraction/rounding, so draw-heavy compositions (fog+NEE+MIS)
    flip more fp-tie path decisions than the CPU-interpret tier's 1e-3
    budget (measured 0.20% flipped entries on the fog gate) — each flip
    diverges that sample WHOLESALE, so the per-entry budget is 1% while
    the estimator MEANS (the physics) must agree to 1%."""
    from l2n_tpu.render.state import init_frame_state
    from l2n_tpu.render.step import build_render_step

    accums = {}
    for be in ("pallas", "xla"):
        step = build_render_step(cfg, scene, backend=be)
        st = init_frame_state(cfg)
        for _ in range(steps):
            st = step(st, cam.packed())
        accums[be] = np.asarray(st.accum)
    a, b = accums["xla"], accums["pallas"]
    assert (a[:3].max(0) > 0).mean() > 0.1, "near-black comparison"
    np.testing.assert_array_equal(a[3], b[3])
    diff = np.abs(a - b)
    flipped = (diff > 1e-3).mean()
    assert flipped < 1e-2, (float(flipped), float(diff.max()))
    mean_a, mean_b = float(a[:3].mean()), float(b[:3].mean())
    assert abs(mean_a - mean_b) < 0.01 * max(mean_a, 1e-6), (mean_a, mean_b)


def test_fog_nee_mis_kernel_on_hw():
    """The r4 composition frontier — homogeneous fog + NEE + MIS — through
    the COMPILED sphere kernel on the chip, against the oracle."""
    from l2n_tpu.config import RenderConfig
    from l2n_tpu.scene import compute_spheres
    from tests.test_brdf import TestRenderIntegration

    cfg = RenderConfig(width=256, height=128, tile_height=32, tile_width=128,
                       tiles_per_step=8, spp_per_step=4, rng="threefry",
                       emissive_every=2, nee=True, mis=True,
                       fog_density=0.0008, fog_albedo=0.8).validate()
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    _kernel_vs_oracle(cfg, scene, TestRenderIntegration._aimed_camera(cfg))


def test_explicit_lights_kernel_on_hw():
    """The r4 live light/material buffers through the COMPILED kernel on
    the chip: a point light + albedo overrides, against the oracle."""
    from l2n_tpu.camera import Camera
    from l2n_tpu.config import RenderConfig
    from l2n_tpu.render.program import SphereProgram
    from l2n_tpu.render.state import init_frame_state
    from l2n_tpu.scene import compute_spheres
    from l2n_tpu.scene.materials import (
        DirectionalLights,
        PhongMaterials,
        PointLights,
    )
    from tests.test_brdf import TestRenderIntegration

    cfg = RenderConfig(width=256, height=128, tile_height=32, tile_width=128,
                       tiles_per_step=8, spp_per_step=4,
                       rng="threefry").validate()
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    cam = TestRenderIntegration._aimed_camera(cfg)
    import numpy as _np
    mats = PhongMaterials.from_arrays(
        _np.array([[0.9, 0.2, 0.1, 1.0], [0.1, 0.8, 0.3, 1.0]], _np.float32),
        _np.zeros((2, 3), _np.float32), _np.zeros(2, _np.float32))
    pls = PointLights.from_arrays(
        _np.array([[0.0, 0.0, 0.0]], _np.float32),
        _np.array([[5e7, 4e7, 3e7]], _np.float32))
    dls = DirectionalLights.from_arrays(
        _np.array([[0.3, -1.0, 0.2]], _np.float32),
        _np.array([[0.5, 0.5, 0.6]], _np.float32))
    accums = {}
    for be in ("pallas", "xla"):
        prog = SphereProgram(cfg, scene=scene, backend=be, materials=mats,
                             point_lights=pls, directional_lights=dls)
        st = init_frame_state(cfg)
        for _ in range(2):
            st = prog.step(st, cam.packed())
        accums[be] = np.asarray(st.accum)
    a, b = accums["xla"], accums["pallas"]
    assert (a[:3].max(0) > 0).mean() > 0.1
    np.testing.assert_array_equal(a[3], b[3])
    # Dirac lights make HARD shadow boundaries: every silhouette pixel's
    # visibility is an fp knife-edge, and with 8 samples/entry the
    # any-flip measure reaches percents on hardware (measured 4.3% on
    # this scene — light at the cluster center, occlusion edges
    # everywhere). Flips are symmetric (gain/lose ~I·f/d² either way),
    # so the gate is CHANNEL-WISE estimator agreement (catches a wrong
    # light term, wrong radiometry, or a swapped albedo override) plus a
    # loose flip sanity bound.
    diff = np.abs(a - b)
    flipped = (diff > 1e-3).mean()
    assert flipped < 0.10, (float(flipped), float(diff.max()))
    for c in range(3):
        ma, mb = float(a[c].mean()), float(b[c].mean())
        assert abs(ma - mb) < 0.02 * max(ma, 1e-6), (c, ma, mb)


def test_bigmesh_trefoil_kernel_on_hw():
    """The 70k-triangle single-mesh frontier COMPILED on the chip: the
    slab-GROUP hierarchy + walk-seeded primaries (round-5) against the
    oracle's 70k-triangle rolled sweep. The reference caps at 32k
    brute-forced triangles (triangle_pathtracing.cs.glsl:164-175); this
    is one mesh at 2x that."""
    from l2n_tpu.config import RenderConfig
    from l2n_tpu.scene.obj import load_obj
    from l2n_tpu.scene.procgen import trefoil_obj
    from tests.test_bigmesh import aimed_camera

    cfg = RenderConfig(width=128, height=64, tile_height=32, tile_width=128,
                       tiles_per_step=2, spp_per_step=2,
                       scene_kind="triangle", rng="threefry").validate()
    scene = load_obj(trefoil_obj())
    assert scene.total_triangles == 70144
    _kernel_vs_oracle(cfg, scene, aimed_camera(cfg, scene))


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
