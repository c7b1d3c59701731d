#!/usr/bin/env python
"""Benchmark harness: Mrays/sec/chip for the fused sphere path tracer.

Headline config (BASELINE.json): 1024x1024, the reference's 128-sphere
procedural scene, depth-2 diffuse GI with Russian roulette and the
Mandelbrot environment, full frame per step.

Metric definition: a "ray" is a physical path segment actually cast — 1
primary per sample plus one continuation per Russian-roulette survivor
(measured on this scene/camera via an instrumented oracle pass, not
assumed). `vs_baseline` is the ratio to the 1 Gray/sec/chip north star
(BASELINE.md).

Structure (hardened after the round-2 rc=124 timeout): a no-JAX parent
orchestrator runs each measurement as a subprocess with its own wall-clock
budget.  The headline lands first; the secondaries (threefry-parity
sampler, triangle scene) are best-effort — if one hits a cold multi-minute
Pallas compile it is killed and marked "skipped (budget)" instead of
taking the whole record down.  The parent always prints exactly ONE JSON
line on stdout and exits 0; human-readable detail goes to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

NORTH_STAR_MRAYS = 1000.0
TOTAL_BUDGET_S = float(os.environ.get("L2N_BENCH_BUDGET_S", "480"))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Measurement stages (each runs in its own subprocess: own JAX client, own
# TPU lease, own budget; prints one JSON line on stdout).
# --------------------------------------------------------------------------

def _setup():
    from l2n_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()  # warm starts: kernels compile in minutes cold
    import jax
    return jax, jax.default_backend() == "tpu"


def _headline_cfg(on_tpu: bool):
    from l2n_tpu.config import RenderConfig
    if on_tpu:
        # Production config: the TPU hardware PRNG (rng="tpu_hw"). The
        # threefry parity sampler's throughput is reported by the threefry
        # stage; all oracle-parity gates in tests/ run with threefry/tinymt.
        # Whole-frame steps (tiles_per_step = all 1024 tiles — the
        # reference's GUI-tunable knob, src/main.cpp:974): measured ~3%
        # faster than 256-tile steps (fewer per-step schedule gathers).
        # fast_math=True: rsqrt-form roots/normalizes in the sweeps and
        # bounce chain (config.py's fast_math doc). Final-ulp-only drift;
        # the 1024x1024 kernel-vs-oracle accuracy gate passes WITH
        # fast_math at 1.5e-5 per-sample RMSE vs the 1e-3 north star
        # (benchmarks/accuracy_northstar.py --fast, 2026-08-20), and the
        # reference's own GLSL sqrt/normalize/inversesqrt carry no IEEE
        # guarantee on GPU either. Measured 2026-08-20: 4.983 ms/step =
        # 1,027.9 Mrays/s vs 5.41 ms exact (PROFILE.md "fast-math roots").
        return RenderConfig(width=1024, height=1024, tile_height=32,
                            tile_width=128, tiles_per_step=1024,
                            spp_per_step=4, rng="tpu_hw",
                            fast_math=True).validate()
    return RenderConfig(width=256, height=256, tile_height=32,
                        tile_width=128, tiles_per_step=16).validate()


def _measure_program(prog, state, camera, calls, spc, reps):
    """Steady-state (marginal) step time by difference timing: the tunnel-
    attached chip pays a ~26 ms first-dispatch RTT per sequence, after
    which dispatches pipeline and the chip runs back-to-back; timing one
    short and one long sequence and differencing cancels the constant.
    This is the production regime — a progressive render is a long
    sequence of identical steps (src/main.cpp:951).

    Synchronization is a tiny device->host FETCH, not block_until_ready:
    on a fresh axon client whose predecessor process had just exited,
    block_until_ready was observed to return EARLY (a no-op) while the
    work kept executing asynchronously — difference timing collapsed to
    ~0 with perfectly correct images (round-5, 2026-08-20: two full-bench
    runs recorded 1.0e6 'Mrays/s' while the isolated stage measured 5.03
    ms/step). A transfer cannot lie about completion: the bytes must
    exist. The extra ~26 ms RTT per sequence is a constant the
    differencing cancels."""
    import numpy as np

    packed = camera.packed()

    def sync():
        np.asarray(state.output[:1, :1, :1])  # 4-byte forced D2H round trip

    state = prog.step(state, packed)      # warm up / compile
    sync()

    def run_seq(n_calls):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state = prog.step(state, packed)
        sync()
        return time.perf_counter() - t0

    dt = float("inf")
    long_calls = calls * 10
    for _ in range(reps):
        t_short = run_seq(calls)
        t_long = run_seq(long_calls)
        dt = min(dt, (t_long - t_short) / ((long_calls - calls) * spc))
    if dt < 1e-4:
        # No stage's step can physically run in <0.1 ms (the smallest
        # renders ~4M samples); a smaller reading means the sync lied.
        log(f"SUSPECT TIMING: {dt * 1e3:.4f} ms/step is physically "
            "impossible — treating measurement as invalid")
        raise RuntimeError(f"implausible step time {dt * 1e3:.4f} ms")
    return dt


def measure_mean_segments(cfg, scene, camera) -> float:
    """Instrumented oracle pass: 1 + sum of RR-survivor fractions.

    A pure function of (sources, cfg, scene, camera), so the value is
    PERSISTED next to the AOT cache and the trace runs under ONE jit
    dispatch when it does run. The round-4 version executed the 256x256
    oracle EAGERLY — hundreds of op dispatches over the tunnel's ~26 ms
    RTT, the ~6-minute burn that made the driver skip every secondary
    stage (VERDICT r4 weak #1 / next #1a-b)."""
    import json
    import numpy as np
    from l2n_tpu.utils import aot_cache

    packed = np.asarray(camera.packed())
    key = aot_cache.digest("mean_segments", aot_cache.source_digest(),
                           cfg, scene, packed)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".aot_cache", f"mean_segments-{key[:24]}.json")
    if os.path.exists(path):
        try:
            with open(path) as fh:
                val = float(json.load(fh)["mean_segments"])
            log(f"mean segments/sample {val:.4f} (persisted: {path})")
            return val
        except Exception as e:
            log(f"mean-segments cache unreadable ({e}); remeasuring")

    import jax
    import jax.numpy as jnp
    from l2n_tpu.ops.pathtrace import generate_rays, trace_path
    from l2n_tpu.render.step import make_intersector
    from l2n_tpu.rng.sampler import ThreefrySampler, max_pairs_per_sample

    intersect, _, _, _ = make_intersector(cfg, scene)
    h, w = 256, 256  # statistics resolution (fractions converge fast)

    def survive_fractions(packed_dev):
        py, px = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.int32) * (cfg.height // h),
            jnp.arange(w, dtype=jnp.int32) * (cfg.width // w), indexing="ij")
        pixel_index = (px + py * jnp.int32(cfg.padded_width)).astype(
            jnp.uint32)
        sampler = ThreefrySampler(cfg.seed, 0, pixel_index,
                                  jnp.zeros((h, w), jnp.uint32),
                                  max_pairs_per_sample(cfg.max_bounces))
        u1, u2 = sampler.draw2()
        rays = generate_rays(cfg, packed_dev, px.astype(jnp.float32),
                             py.astype(jnp.float32), u1, u2)
        stats: dict = {}
        trace_path(cfg, intersect, sampler, *rays, stats=stats)
        return jnp.stack(stats["survive_fraction"])

    # Jit on TPU only: eager dispatch is what burned minutes over the
    # tunnel's RTT, but on XLA:CPU (the fallback path) the jit costs a
    # multi-minute full-depth compile while eager runs in seconds.
    if jax.default_backend() == "tpu":
        fractions = jax.jit(survive_fractions)(jnp.asarray(packed))
    else:
        fractions = survive_fractions(jnp.asarray(packed))
    val = 1.0 + float(np.asarray(fractions).sum())
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump({"mean_segments": val}, fh)
    except OSError as e:
        log(f"mean-segments cache write failed ({e})")
    return val


def stage_headline() -> dict:
    # Per-phase wall-clock logging (VERDICT r4 next #1a): the r4 official
    # record burned ~390s in this stage with no log line saying where.
    t0 = time.monotonic()

    def phase(name):
        log(f"[headline +{time.monotonic() - t0:6.1f}s] {name}")

    jax, on_tpu = _setup()
    phase("jax init + device probe done")
    from l2n_tpu.camera import Camera
    from l2n_tpu.render.program import SphereProgram
    from l2n_tpu.render.state import init_frame_state
    from l2n_tpu.scene import compute_spheres

    cfg = _headline_cfg(on_tpu)
    # steps_per_call fuses scheduler steps into one dispatch (identical
    # images — see tests/test_kernels.py::TestStepsPerCall); dispatch
    # through the tunnel-attached chip costs ~1.3 ms/step unamortized.
    backend, calls, spc, reps = (("pallas", 4, 5, 3) if on_tpu
                                 else ("xla", 3, 1, 1))
    log(f"backend={backend} device={jax.devices()[0]} "
        f"image={cfg.width}x{cfg.height} "
        f"tiles/step={cfg.effective_tiles_per_step}")

    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    camera = Camera.from_config(cfg)

    def measure(c, label, n_reps):
        prog = SphereProgram(c, scene=scene, backend=backend,
                             steps_per_call=spc)
        phase(f"{label}: program built")
        dt = _measure_program(prog, init_frame_state(c), camera,
                              calls, spc, n_reps)
        phase(f"{label}: measured {dt * 1e3:.2f} ms/step")
        return dt

    dt = measure(cfg, "fast", reps)
    mean_segments = measure_mean_segments(cfg, scene, camera)
    phase("mean segments done")

    pixels_per_step = (cfg.effective_tiles_per_step * cfg.tile_height
                       * cfg.tile_width * cfg.spp_per_step)
    samples_per_sec = pixels_per_step / dt
    spp_per_sec = samples_per_sec / (cfg.width * cfg.height)
    mrays_per_sec = samples_per_sec * mean_segments / 1e6

    log(f"{dt * 1e3:.2f} ms/step, {samples_per_sec / 1e6:.1f} Msamples/s, "
        f"{spp_per_sec:.1f} spp/s, mean segments/sample {mean_segments:.3f}")
    log(f"=> {mrays_per_sec:.1f} Mrays/s (north star "
        f"{NORTH_STAR_MRAYS:.0f})")
    out = {
        "on_tpu": on_tpu,
        "mrays_per_sec": round(mrays_per_sec, 2),
        "samples_per_sec_M": round(samples_per_sec / 1e6, 2),
        "spp_per_sec": round(spp_per_sec, 2),
        "mean_segments_per_sample": round(mean_segments, 4),
        "ms_per_full_frame_spp": round(dt * 1e3 * (cfg.width * cfg.height)
                                       / pixels_per_step, 3),
        "rng": cfg.rng,
        "backend": backend,
    }
    if on_tpu:
        # The exact-math pair (VERDICT r4 next #2): time the identical
        # config with fast_math OFF in the SAME record, so the official
        # artifact carries both the production number and the exact-parity
        # anchor whatever 3% chip-condition band the session lands in
        # (benchmarks/PROFILE.md "day-scale chip-condition variance").
        dt_exact = measure(cfg.replace(fast_math=False), "exact", 2)
        exact_mrays = pixels_per_step / dt_exact * mean_segments / 1e6
        log(f"exact-math pair: {dt_exact * 1e3:.2f} ms/step => "
            f"{exact_mrays:.1f} Mrays/s "
            f"(fast/exact = {dt_exact / dt:.4f}x)")
        out["exact_mrays_per_sec"] = round(exact_mrays, 2)
        out["exact_ms_per_step"] = round(dt_exact * 1e3, 3)
        out["fast_over_exact"] = round(dt_exact / dt, 4)
    return out


def stage_threefry() -> dict:
    """Secondary: the bit-parity-friendly threefry sampler's throughput
    (the default config; every oracle-parity gate runs with it)."""
    jax, on_tpu = _setup()
    if not on_tpu:
        return {"skipped": "no TPU"}
    from l2n_tpu.camera import Camera
    from l2n_tpu.render.program import SphereProgram
    from l2n_tpu.render.state import init_frame_state
    from l2n_tpu.scene import compute_spheres

    # fast_math=False: this stage's identity is the bit-parity
    # configuration (every oracle-parity gate runs it); keep it exact.
    cfg = _headline_cfg(True).replace(rng="threefry", fast_math=False)
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    prog = SphereProgram(cfg, scene=scene, backend="pallas", steps_per_call=5)
    dt = _measure_program(prog, init_frame_state(cfg),
                          Camera.from_config(cfg), 4, 5, 2)
    log(f"threefry sampler: {dt * 1e3:.2f} ms/step")
    return {"threefry_ms_per_step": round(dt * 1e3, 2)}


def stage_triangle() -> dict:
    """Secondary: the triangle-scene kernel (the reference's second
    renderer; 128 meshes x 256 triangles)."""
    jax, on_tpu = _setup()
    if not on_tpu:
        return {"skipped": "no TPU"}
    from l2n_tpu.camera import Camera
    from l2n_tpu.render.program import TriangleProgram
    from l2n_tpu.render.state import init_frame_state

    # 256-tile steps measured ~7% faster than whole-frame steps for the
    # triangle kernel (smaller per-step shellwalk code footprint).
    # fast_math=False: the triangle kernel has no measured fast-math win
    # (the sweeps are sphere-root math); keep the stage comparable to the
    # r2/r3 records and the triangle goldens.
    cfg = _headline_cfg(True).replace(scene_kind="triangle", spp_per_step=4,
                                      tiles_per_step=256, fast_math=False)
    prog = TriangleProgram(cfg, backend="pallas")
    dt = _measure_program(prog, init_frame_state(cfg),
                          Camera.from_config(cfg), 2, 1, 2)
    ms_full = dt * 1e3 * (cfg.width * cfg.height) / (
        cfg.effective_tiles_per_step * cfg.tile_height
        * cfg.tile_width * cfg.spp_per_step)
    log(f"triangle scene: {ms_full:.1f} ms per full-frame spp")
    return {"triangle_ms_per_full_frame_spp": round(ms_full, 1)}


def stage_obj() -> dict:
    """Tertiary: an arbitrary-mesh OBJ scene (24 tori x 768 triangles, no
    procedural-sphere shellwalk shortcut) through the slab-based work-list
    walk -- the cost of real imported geometry (reference wishlist analog:
    /root/reference/TODO.md:9 'CPU intersection with embree')."""
    jax, on_tpu = _setup()
    if not on_tpu:
        return {"skipped": "no TPU"}
    from l2n_tpu.camera import Camera
    from l2n_tpu.render.program import TriangleProgram
    from l2n_tpu.render.state import init_frame_state
    from l2n_tpu.scene.obj import load_obj
    from l2n_tpu.scene.procgen import torus_field_obj

    # spp1 whole-frame steps measured 12% faster than spp4/256-tile for
    # the slab walk (knob_sweep r4: 13.7 vs 15.5 ms/frame-spp; the
    # OPPOSITE of the tessellated scene, where spp1 lost 3%): one sample
    # per bounce walk keeps the per-slab DMA/flag machinery's live range
    # short, and whole-frame dispatch amortizes the schedule. With the
    # double-buffered slab copies this shape lands 12.6 ms/frame-spp
    # (PROFILE.md round-4 walk ablations).
    cfg = _headline_cfg(True).replace(scene_kind="triangle", spp_per_step=1,
                                      tiles_per_step=1024, fast_math=False)
    scene = load_obj(torus_field_obj())
    log(f"obj scene: meshes={scene.mesh_count} tris={scene.total_triangles}")
    prog = TriangleProgram(cfg, scene=scene, backend="pallas")
    dt = _measure_program(prog, init_frame_state(cfg),
                          Camera.from_config(cfg), 2, 1, 2)
    ms_full = dt * 1e3 * (cfg.width * cfg.height) / (
        cfg.effective_tiles_per_step * cfg.tile_height
        * cfg.tile_width * cfg.spp_per_step)
    log(f"obj torus-field scene: {ms_full:.1f} ms per full-frame spp")
    return {"obj_ms_per_full_frame_spp": round(ms_full, 1),
            "obj_tris": int(scene.total_triangles)}


def stage_bigobj() -> dict:
    """Tertiary: ONE 70k-triangle mesh (trefoil knot tube) through the
    slab-GROUP hierarchy with walk-seeded primaries — the big-mesh scaling
    frontier (reference wishlist /root/reference/TODO.md:9 'CPU
    intersection with embree'; the reference brute-forces 128x256 = 32k
    triangles, triangle_pathtracing.cs.glsl:164-175 — this is 2x that in
    a SINGLE mesh, where per-mesh culling cannot help at all)."""
    t0 = time.monotonic()

    def phase(name):
        log(f"[bigobj +{time.monotonic() - t0:6.1f}s] {name}")

    jax, on_tpu = _setup()
    if not on_tpu:
        return {"skipped": "no TPU"}
    import numpy as np
    from l2n_tpu.camera import Camera
    from l2n_tpu.maths.linalg import look_at
    from l2n_tpu.render.program import TriangleProgram
    from l2n_tpu.render.state import init_frame_state
    from l2n_tpu.scene.obj import load_obj
    from l2n_tpu.scene.procgen import trefoil_obj

    # Same knob choices as the torus-field obj stage (spp1 whole-frame:
    # the measured walk winner, see stage_obj).
    cfg = _headline_cfg(True).replace(scene_kind="triangle", spp_per_step=1,
                                      tiles_per_step=1024, fast_math=False)
    scene = load_obj(trefoil_obj())
    phase(f"scene loaded: {scene.mesh_count} mesh, "
          f"{scene.total_triangles} tris")
    # Aimed camera: the knot must FILL the view — a benchmark of sky
    # pixels would flatter the walk.
    verts = np.asarray(scene.vertices).reshape(-1, 3)
    target = verts.mean(0).astype(np.float32)
    radius = float(np.linalg.norm(verts - target, axis=1).max())
    vm = look_at(target + np.array([0.35, 0.25, 1.0], np.float32)
                 * 1.45 * radius, target,
                 np.array([0.0, 1.0, 0.0], np.float32))
    camera = Camera.from_config(cfg, view_matrix=vm)
    prog = TriangleProgram(cfg, scene=scene, backend="pallas")
    phase("program built (pack cached + AOT)")
    dt = _measure_program(prog, init_frame_state(cfg), camera, 2, 1, 2)
    phase("measured")
    ms_full = dt * 1e3 * (cfg.width * cfg.height) / (
        cfg.effective_tiles_per_step * cfg.tile_height
        * cfg.tile_width * cfg.spp_per_step)
    log(f"bigobj trefoil 70k: {ms_full:.1f} ms per full-frame spp")
    return {"bigobj_ms_per_full_frame_spp": round(ms_full, 1),
            "bigobj_tris": int(scene.total_triangles)}


_SECONDARY_KEYS = {
    "threefry": "threefry_ms_per_step",
    "triangle": "triangle_ms_per_full_frame_spp",
    "obj": "obj_ms_per_full_frame_spp",
    "bigobj": "bigobj_ms_per_full_frame_spp",
}


def stage_all() -> dict:
    """Every stage in ONE process. The axon server makes a freshly
    attached client pay a multi-minute stall when the previous client's
    teardown is still in flight (round-5, benchmarks/PROFILE.md: 557 s
    observed right after a trivial probe process — the r4 official
    record's secondary-killing burn). One process = one attach = at most
    one stall; warm stages then run in seconds each. A stage failure is
    contained so the rest of the record still lands (the parent retries
    missing stages as subprocesses if budget remains)."""
    out = stage_headline()
    if out.get("on_tpu"):
        for name, fn in (("threefry", stage_threefry),
                         ("triangle", stage_triangle),
                         ("obj", stage_obj),
                         ("bigobj", stage_bigobj)):
            try:
                t0 = time.monotonic()
                out.update(fn() or {})
                log(f"[all] stage {name} done in "
                    f"{time.monotonic() - t0:.1f}s")
            except Exception as e:
                log(f"[all] stage {name} failed in-process: "
                    f"{type(e).__name__}: {e}")
    return out


STAGES = {
    "headline": stage_headline,
    "threefry": stage_threefry,
    "triangle": stage_triangle,
    "obj": stage_obj,
    "bigobj": stage_bigobj,
    "all": stage_all,
}


# --------------------------------------------------------------------------
# Parent orchestrator (no JAX — immune to compile stalls).
# --------------------------------------------------------------------------

def _cpu_env() -> dict:
    """Environment for a forced-CPU stage: the axon plugin HANGS (not
    errors) on every jax init when the tunnel is down, so the fallback
    must both remove the pool routing and pin the platform."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def run_stage(name: str, timeout_s: float, env: dict | None = None
              ) -> dict | None:
    log(f"--- stage {name} (budget {timeout_s:.0f}s"
        + (", forced CPU" if env else "") + ")")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", name],
            stdout=subprocess.PIPE, timeout=timeout_s, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)) or None)
    except subprocess.TimeoutExpired:
        log(f"stage {name}: killed at {timeout_s:.0f}s budget")
        return None
    if proc.returncode != 0:
        log(f"stage {name}: exited rc={proc.returncode}")
        return None
    for line in reversed(proc.stdout.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    log(f"stage {name}: no JSON line in output")
    return None


def probe_device(timeout_s: float) -> bool:
    """One subprocess that initializes the JAX backend. When the axon
    tunnel is down, EVERY jax init hangs (not errors) — a round-2-style
    rc=124 would eat the whole record. Probing first lets the parent wait
    out a transient tunnel flap and still leave budget for measurement."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            stdout=subprocess.PIPE, timeout=timeout_s)
        return proc.returncode == 0 and b"ok" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    t0 = time.monotonic()
    remaining = lambda: TOTAL_BUDGET_S - (time.monotonic() - t0)

    # Wait out a down tunnel for up to ~25% of the budget (probe ~60s
    # each). Round 3 let the probe phase eat 315/480s and the headline
    # died in what was left — a CPU-fallback record beats value 0.0, and
    # a capped probe leaves a mid-budget tunnel recovery room to land.
    tunnel_down = False
    while not probe_device(min(60.0, max(10.0, remaining() - 10.0))):
        log(f"device probe failed ({remaining():.0f}s budget left)")
        if remaining() < 0.75 * TOTAL_BUDGET_S:
            tunnel_down = True
            log("tunnel down: falling back to forced-CPU stages")
            break
        time.sleep(10.0)

    # Headline is required: give it the budget minus a reserve for the
    # final print (secondaries are sacrificed if it runs long). On TPU
    # the FIRST attempt is the combined single-process stage — one client
    # attach, so the post-predecessor stall (see stage_all) is paid at
    # most once for the whole record instead of once per stage.
    env = _cpu_env() if tunnel_down else None
    head = run_stage("headline" if tunnel_down else "all",
                     max(60.0, remaining() - 15.0), env=env)
    if head is None and not tunnel_down:
        # Combined stage died (mid-stage tunnel drop, cold-compile
        # overrun). Retry the headline alone, then CPU fallback.
        head = run_stage("headline", max(60.0, remaining() - 15.0))
    if head is None and not tunnel_down:
        tunnel_down = True
        env = _cpu_env()
        head = run_stage("headline", max(45.0, remaining() - 10.0), env=env)
    if head is None:
        # Still emit a parseable record rather than nothing.
        print(json.dumps({
            "metric": "Mrays/sec/chip (sphere path tracer, 1024x1024, "
                      "depth 2 + RR)",
            "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
            "detail": {"error": "headline stage failed or timed out "
                                "(TPU and CPU fallback)"},
        }), flush=True)
        return

    detail = {k: v for k, v in head.items()
              if k not in ("on_tpu", "mrays_per_sec")}
    if tunnel_down:
        detail["error"] = "tunnel down; CPU fallback"
    # VERDICT r2 item 2: measured deltas of both candidate designs for
    # closing the last ~5% to 1 Gray/s. The numbers live in
    # benchmarks/PROFILE.md ("Round-3: the 1 Gray/s gap, quantified") +
    # benchmarks/bounce_union.py — static round-3 measurements, NOT
    # produced by this run (ADVICE r3: don't re-emit them as if fresh).
    detail["roofline"] = {
        "see": "benchmarks/PROFILE.md: 'Round-3: the 1 Gray/s gap, "
               "quantified' (bounce-union density 0.406, MXU sweep an "
               "isolation artifact)",
        "measured_at": "round 3, commit c7bc749, 2026-08-17",
    }
    on_tpu = head.get("on_tpu", False)
    secondaries = (["threefry", "triangle", "obj", "bigobj"]
                   if on_tpu else [])
    for name in secondaries:
        if _SECONDARY_KEYS[name] in detail:
            continue  # landed inside the combined stage
        if remaining() < 90.0:
            detail[name] = "skipped (budget)"
            log(f"stage {name}: skipped ({remaining():.0f}s left)")
            continue
        out = run_stage(name, remaining() - 20.0)
        if out is None:
            detail[name] = "skipped (budget)"
        else:
            detail.update(out)

    mrays = head["mrays_per_sec"]
    result = {
        "metric": "Mrays/sec/chip (sphere path tracer, 1024x1024, depth 2 "
                  "+ RR)" if on_tpu else "Mrays/sec (CPU fallback, 256x256)",
        "value": mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
        "detail": detail,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        out = STAGES[sys.argv[2]]()
        print(json.dumps(out), flush=True)
    else:
        main()
