"""AOT executable cache (`utils/aot_cache`): keying, kill switch, fallback.

The cache is an accelerator, never a correctness dependency — these tests
pin the properties that make that true: stable content-keying, invalidation
on any keyed input, graceful degradation to plain jit everywhere, and (in
forced-on mode, on the XLA:CPU backend) an actual serialize/load round trip
producing identical results.

No reference analog: GL shader-binary caching lives in the GL driver
(the reference re-links per run, main.cpp compileProgram); this is TPU
operational machinery for multi-minute Mosaic compiles + unrolled traces.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l2n_tpu.utils import aot_cache
from l2n_tpu.utils.aot_cache import aot_jit, digest


class TestDigest:
    def test_deterministic(self):
        parts = (1, "a", np.arange(5), {"k": 2.5}, [True, None])
        assert digest(*parts) == digest(*parts)

    def test_array_content_sensitivity(self):
        a = np.arange(8, dtype=np.float32)
        b = a.copy()
        assert digest(a) == digest(b)
        b[3] += 1.0
        assert digest(a) != digest(b)

    def test_shape_dtype_sensitivity(self):
        a = np.zeros((4, 2), np.float32)
        assert digest(a) != digest(a.reshape(2, 4))
        assert digest(a) != digest(a.astype(np.float64))

    def test_dataclass_fields(self):
        from l2n_tpu.config import RenderConfig
        c1 = RenderConfig(width=128, height=64, tile_width=128,
                          tile_height=32)
        c2 = c1.replace(max_bounces=c1.max_bounces + 1)
        assert digest(c1) == digest(c1)
        assert digest(c1) != digest(c2)

    def test_dict_order_insensitive(self):
        assert digest({"a": 1, "b": 2}) == digest({"b": 2, "a": 1})

    def test_jax_array_by_content(self):
        a = jnp.arange(4, dtype=jnp.float32)
        assert digest(a) == digest(np.arange(4, dtype=np.float32))


class TestAotJit:
    def test_kill_switch_returns_plain_jit(self, monkeypatch):
        monkeypatch.setenv("L2N_AOT_CACHE", "0")
        fn = aot_jit(lambda x: x * 2, name="t_kill")
        out = fn(jnp.float32(3.0))
        assert float(out) == 6.0

    def test_tpu_only_policy_skips_on_cpu(self, monkeypatch, tmp_path):
        # Default policy "tpu": on the CPU test backend the wrapper must
        # behave as plain jit and write nothing to the cache dir.
        monkeypatch.delenv("L2N_AOT_CACHE", raising=False)
        fn = aot_jit(lambda x: x + 1, name="t_policy",
                     cache_dir=str(tmp_path))
        assert float(fn(jnp.float32(1.0))) == 2.0
        assert list(tmp_path.iterdir()) == []

    def test_forced_roundtrip_and_reload(self, monkeypatch, tmp_path):
        # L2N_AOT_CACHE=1 forces serialization even on CPU; a second
        # wrapper with the same key must LOAD (observable via the cache
        # file existing and results matching the plain function).
        monkeypatch.setenv("L2N_AOT_CACHE", "1")
        key = (np.float32(4.0),)

        def f(x):
            return x * x + 1.0

        fn1 = aot_jit(f, name="t_rt", key_parts=key,
                      cache_dir=str(tmp_path))
        x = jnp.float32(3.0)
        r1 = float(fn1(x))
        files = list(tmp_path.iterdir())
        if not files:
            pytest.skip("XLA:CPU executable serialization unavailable")
        fn2 = aot_jit(f, name="t_rt", key_parts=key,
                      cache_dir=str(tmp_path))
        assert float(fn2(x)) == r1 == float(f(x))
        # Same dir, different key_parts -> a distinct entry, not a clash.
        fn3 = aot_jit(f, name="t_rt", key_parts=(np.float32(5.0),),
                      cache_dir=str(tmp_path))
        assert float(fn3(x)) == r1
        assert len(list(tmp_path.iterdir())) == 2

    def test_corrupt_entry_degrades_to_recompile(self, monkeypatch,
                                                 tmp_path):
        monkeypatch.setenv("L2N_AOT_CACHE", "1")

        def f(x):
            return x - 1.0

        fn1 = aot_jit(f, name="t_bad", cache_dir=str(tmp_path))
        assert float(fn1(jnp.float32(2.0))) == 1.0
        files = list(tmp_path.iterdir())
        if not files:
            pytest.skip("XLA:CPU executable serialization unavailable")
        files[0].write_bytes(b"not a pickle")
        fn2 = aot_jit(f, name="t_bad", cache_dir=str(tmp_path))
        assert float(fn2(jnp.float32(2.0))) == 1.0  # recompiled, not crashed

    def test_source_digest_stable_within_process(self):
        assert aot_cache.source_digest() == aot_cache.source_digest()
        assert len(aot_cache.source_digest()) == 64


class TestDigestScope:
    """The digest covers exactly the trace-relevant tier (VERDICT r4 next
    #6): editing app/docs-adjacent code must NOT invalidate executables,
    and no module a kernel step imports at trace time may escape it."""

    def test_host_only_tiers_excluded(self):
        files = set(aot_cache.digest_files())
        # The r4 failure mode: an interactive-UI edit forced a 15-minute
        # triangle re-warm. These must never key an executable:
        for rel in ("app/interactive.py", "app/application.py",
                    "utils/aot_cache.py", "utils/profiling.py",
                    "parallel/step.py", "native/api.py"):
            assert rel not in files, rel

    def test_trace_tier_included(self):
        files = set(aot_cache.digest_files())
        for rel in ("ops/kernels/sphere_pt.py", "ops/kernels/triangle_pt.py",
                    "ops/pathtrace.py", "maths/brdf.py", "render/step.py",
                    "render/tiles.py", "rng/threefry.py", "scene/spheres.py",
                    "scene/tessellate.py", "camera/camera.py", "config.py"):
            assert rel in files, rel

    def test_no_trace_import_escapes_digest(self):
        """Build both kernel-tier steps, then verify every l2n_tpu module
        actually imported sits inside the digest set (or is an explicitly
        host-only tier). Catches a future refactor moving trace-relevant
        code into utils/ without updating TRACE_RELEVANT_DIRS."""
        import sys

        from l2n_tpu.config import RenderConfig
        from l2n_tpu.render.step import build_render_step
        from l2n_tpu.scene import build_triangle_scene, compute_spheres

        cfg = RenderConfig(width=128, height=32, tile_width=128,
                           tile_height=32, sphere_count=4).validate()
        spheres = compute_spheres(4, cfg.world_size, 0)
        build_render_step(cfg, spheres, backend="pallas")
        tri_cfg = cfg.replace(scene_kind="triangle", disc_lat=4, disc_long=3)
        build_render_step(tri_cfg,
                          build_triangle_scene(spheres, 4, 3),
                          backend="pallas")

        covered = {rel[:-3].replace("/", ".") for rel
                   in aot_cache.digest_files()}  # e.g. "ops.kernels.common"
        covered |= {m.rsplit(".", 1)[0] for m in covered}  # packages
        # Host-only by design: the cache/compile-cache machinery itself and
        # anything that cannot alter a traced program.
        host_only_prefixes = ("utils", "app", "parallel", "native")
        for name in list(sys.modules):
            if not name.startswith("l2n_tpu"):
                continue
            sub = name[len("l2n_tpu."):] if name != "l2n_tpu" else ""
            if sub == "" or sub.startswith(host_only_prefixes):
                continue
            assert sub in covered, (
                f"trace-time import {name} is outside the AOT digest scope "
                "(aot_cache.TRACE_RELEVANT_DIRS) — stale-executable risk")
